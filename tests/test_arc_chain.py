"""arc_chain_sparse: the one-walk replacement for the polyline stage's
strings-CCL -> count_ends/break_loops -> arc_number -> label_arcs chain.

The sparse tail must reproduce the dense reference tail EXACTLY
(ids included) on any scene whose cycles stay off the image border:
component roots are min flat indices, so the walk's min-visited cycle
root is the same pixel break_loops kills, and the head-grouped arc ids
equal labelpl's min-arc-pixel ids (see polyline._polyline_tail_sparse).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from rectdetect_tpu.config import DEFAULT_CONFIG
from rectdetect_tpu.ops import polyline as tpoly

DENSE = dataclasses.replace(DEFAULT_CONFIG, sparse_factor=0)


def _segments(arena):
    a = {k: np.asarray(v) for k, v in arena._asdict().items()}
    out = {}
    for g in range(1, int(a["count"]) + 1):
        if a["polyid"][g] == 0:
            continue
        out[g] = (a["sx"][g], a["sy"][g], a["ex"][g], a["ey"][g],
                  int(a["start_index"][g]), int(a["end_index"][g]),
                  int(a["left_ptr"][g]), int(a["right_ptr"][g]))
    return out


def _compare(img, cap=512, minerror=1.0, size_thre=5):
    edge = jnp.asarray(img.astype(np.int32))
    a_d, lsid_d = tpoly.polyline_execute(edge, minerror, size_thre, cap,
                                         DENSE)
    a_s, lsid_s = tpoly.polyline_execute(edge, minerror, size_thre, cap,
                                         DEFAULT_CONFIG)
    assert int(a_d.count) == int(a_s.count)
    gd, gs = _segments(a_d), _segments(a_s)
    assert set(gd.keys()) == set(gs.keys())
    for g in gd:
        np.testing.assert_allclose(gs[g][:4], gd[g][:4], atol=1e-4,
                                    err_msg=f"seg {g}")
        assert gs[g][4:] == gd[g][4:], f"seg {g}"
    np.testing.assert_array_equal(np.asarray(lsid_s), np.asarray(lsid_d))


def test_fixture_scene():
    # strings incl. an interior loop (same construction as test_polyline)
    h, w = 40, 56
    img = np.zeros((h, w), np.int32)
    for i in range(20):
        img[3 + i // 2, 4 + i] = 1
    img[28, 6:30] = 1
    img[16:29, 6] = 1
    for i in range(18):
        img[8 + (i * i) // 40, 30 + i] = 1
    img[32:38, 40:47] = 1
    img[33:37, 41:46] = 0
    img[10, 50:54] = 1
    _compare(img)


def test_many_rings():
    img = np.zeros((64, 96), np.int32)
    for cy in range(6, 60, 12):
        for cx in range(6, 90, 14):
            img[cy, cx:cx + 8] = 1
            img[cy + 6, cx:cx + 8] = 1
            img[cy:cy + 7, cx] = 1
            img[cy:cy + 7, cx + 7] = 1
    _compare(img, cap=1024, size_thre=3)


def test_random_noise_interior():
    r = np.random.default_rng(7)
    for seed in range(3):
        img = (np.random.default_rng(seed).random((72, 104)) < 0.3)
        img = img.astype(np.int32)
        img[0, :] = img[-1, :] = 0      # keep cycles off the border
        img[:, 0] = img[:, -1] = 0
        _compare(img, cap=2048, size_thre=4)
    del r


def test_long_snake_degrades_deterministically():
    """A chain longer than 2^number_doublings px must not crash or emit
    inconsistent arcs; the walk degrades to deterministic partial
    numbering (the reference degrades identically past its fixed-hop
    reach, oclpolyline.cl:287-310)."""
    import dataclasses as dc
    cfg = dc.replace(DEFAULT_CONFIG, number_doublings=8)  # reach 256 px
    img = np.zeros((40, 120), np.int32)
    for r in range(2, 38, 4):                      # ~1100-px serpentine
        img[r, 2:118] = 1
        if r + 4 < 38:
            img[r:r + 5, 117 if (r // 4) % 2 == 0 else 2] = 1
    edge = jnp.asarray(img)
    a1, l1 = tpoly.polyline_execute(edge, 1.0, 5, 512, cfg)
    a2, l2 = tpoly.polyline_execute(edge, 1.0, 5, 512, cfg)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for k in ("sx", "sy", "ex", "ey", "polyid"):
        np.testing.assert_array_equal(np.asarray(getattr(a1, k)),
                                      np.asarray(getattr(a2, k)))
    # with full reach the same scene is id-exact vs dense
    _compare(img, cap=512)


def test_border_ring_runs():
    """Cycles touching the border split at the border pixel instead of
    the component root (documented deviation) — must run cleanly and
    produce a valid single chain over the same pixels."""
    img = np.zeros((32, 48), np.int32)
    img[0, 10:26] = 1
    img[8, 10:26] = 1
    img[0:9, 10] = 1
    img[0:9, 25] = 1
    edge = jnp.asarray(img)
    arena, lsid = tpoly.polyline_execute(edge, 1.0, 5, 256, DEFAULT_CONFIG)
    segs = _segments(arena)
    assert len(segs) >= 1
    # every live segment's endpoints lie on the drawn ring
    for g, s in segs.items():
        for (x, y) in ((s[0], s[1]), (s[2], s[3])):
            assert img[int(round(y)), int(round(x))] == 1


def test_two_phase_walk_matches_full_walk():
    """The phase-2 sub-list doublings (tail_cap > 0) are bit-identical
    to running every doubling over the full table, including long
    chains (> 2^switch px) and cycles, as long as the sub-list cap
    holds all unconverged states."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops.chain import arc_chain_sparse
    from rectdetect_tpu.ops.compact import compact_mask

    h, w = 96, 128
    img = np.zeros((h, w), np.int32)
    img[10, 2:120] = 1                    # long chain (118 px > 2^6)
    img[30:60, 40] = 1                    # vertical chain
    # a closed ring (cycle), 8-connected
    img[70:80, 60] = 1
    img[70:80, 70] = 1
    img[70, 60:71] = 1
    img[79, 60:71] = 1
    r = np.random.default_rng(11)
    img |= (r.random((h, w)) < 0.08).astype(np.int32)   # noise fragments
    strings = jnp.asarray(img)
    comp = compact_mask((strings != 0).reshape(-1), h * w // 2)

    full = arc_chain_sparse(strings, comp, 12, 1024, tail_cap=0)
    two = arc_chain_sparse(strings, comp, 12, 1024,
                           tail_switch_rounds=4, tail_cap=4096)
    names = ("number", "head", "live", "cyc", "chainlen", "arcmin")
    assert len(full) == len(names) and len(two) == len(names)
    for a, b, name in zip(full, two, names):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_two_phase_walk_u_chain_arcmin():
    """Adversarial freeze-timing case: a U-chain whose NON-head terminal
    is the arc min (excluding the head), with walk states at distance
    exactly 2^switch from that terminal.  A state whose pointer lands on
    the terminal in the final phase-1 round has NOT yet folded the
    terminal's pixel into minv/minv2 — freezing it there corrupts
    arcmin_s (and through _polyline_tail_sparse the arc ids)."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops.chain import arc_chain_sparse
    from rectdetect_tpu.ops.compact import compact_mask

    h, w = 48, 64
    img = np.zeros((h, w), np.int32)
    # U: down col 10 (rows 2..20), across row 20 (cols 10..14), up col 14
    # (rows 20..2).  Ends (2,10) [head: min flat index] and (2,14) [the
    # chain min excluding the head — every interior pixel has row >= 3].
    img[2:21, 10] = 1
    img[20, 10:15] = 1
    img[2:21, 14] = 1
    strings = jnp.asarray(img)
    comp = compact_mask((strings != 0).reshape(-1), 256)

    full = arc_chain_sparse(strings, comp, 12, 64, tail_cap=0)
    for switch in (3, 4, 5):
        two = arc_chain_sparse(strings, comp, 12, 64,
                               tail_switch_rounds=switch, tail_cap=256)
        names = ("number", "head", "live", "cyc", "chainlen", "arcmin")
        for a, b, name in zip(full, two, names):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{name} @ switch={switch}")


def test_two_phase_walk_overflow_is_deterministic():
    """Sub-list overflow freezes the overflowed states at the switch
    reach — deterministically (two runs agree), and converged states
    are unaffected."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops.chain import arc_chain_sparse
    from rectdetect_tpu.ops.compact import compact_mask

    h, w = 64, 128
    img = np.zeros((h, w), np.int32)
    for y in range(4, 60, 4):
        img[y, 2:120] = 1                 # many long chains -> overflow
    strings = jnp.asarray(img)
    comp = compact_mask((strings != 0).reshape(-1), h * w // 2)
    a = arc_chain_sparse(strings, comp, 12, 1024,
                         tail_switch_rounds=3, tail_cap=64)
    b = arc_chain_sparse(strings, comp, 12, 1024,
                         tail_switch_rounds=3, tail_cap=64)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_multi_stage_walk_matches_full_walk():
    """The staged tail (re-compaction after a few sub-list rounds, with
    write-back between stages) is bit-identical to the full walk — on
    long chains, cycles, U-chains (freeze-timing adversarial) and noise,
    across stage splits, including stages whose cap overflows (those
    fall back to full-table rounds for that stage only)."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops.chain import arc_chain_sparse
    from rectdetect_tpu.ops.compact import compact_mask

    h, w = 96, 128
    img = np.zeros((h, w), np.int32)
    img[10, 2:120] = 1                    # long chain
    img[30:60, 40] = 1                    # vertical chain
    img[70:80, 60] = 1                    # ring (cycle)
    img[70:80, 70] = 1
    img[70, 60:71] = 1
    img[79, 60:71] = 1
    img[2:21, 90] = 1                     # U-chain
    img[20, 90:95] = 1
    img[2:21, 94] = 1
    r = np.random.default_rng(13)
    img |= (r.random((h, w)) < 0.08).astype(np.int32)
    strings = jnp.asarray(img)
    comp = compact_mask((strings != 0).reshape(-1), h * w // 2)

    full = arc_chain_sparse(strings, comp, 12, 1024, tail_cap=0)
    names = ("number", "head", "live", "cyc", "chainlen", "arcmin")
    for stages in (((3, 4096), (0, 512)),
                   ((2, 4096), (2, 1024), (0, 256)),
                   ((3, 4096), (0, 8)),       # stage-2 cap overflows
                   ((1, 2), (0, 4096))):      # stage-1 cap overflows
        got = arc_chain_sparse(strings, comp, 12, 1024,
                               tail_switch_rounds=3, tail_cap=4096,
                               tail_stages=stages)
        for a, b, name in zip(full, got, names):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{name} @ stages={stages}")
