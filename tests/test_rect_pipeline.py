"""End-to-end rect pipeline + reduceLS pair table."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from rectdetect_tpu.ops import reduce_ls
from rectdetect_tpu.pipeline.rect import rect_frame, live_rects

TAN = math.tan(math.radians(72) / 2)


def draw_scene(quads, w=192, h=144, bg=(80, 90, 100)):
    from PIL import Image, ImageDraw
    img = Image.new("RGB", (w, h), bg)
    d = ImageDraw.Draw(img)
    colors = [(210, 170, 60), (60, 140, 210), (90, 200, 90)]
    for i, q in enumerate(quads):
        d.polygon([tuple(p) for p in q], fill=colors[i % 3])
    rgb = np.asarray(img, np.uint8)
    return jnp.asarray(rgb[..., ::-1].copy())


def test_pair_bbox_table_cooccurrence():
    h, w = 32, 40
    boundary = np.full((h, w), -1, np.int32)
    boundary[5:12, 6:20] = 100          # boundary strip id 100
    boundary[20:26, 10:30] = 900        # id 900
    lsid = np.zeros((h, w), np.int32)
    lsid[8, 8:18] = 7                   # crosses strip 100
    lsid[22, 12:25] = 3                 # crosses strip 900
    lsid[2, 30:38] = 5                  # >3 px from every boundary strip
    nentry = 4096
    t = reduce_ls.pair_bbox_table(jnp.asarray(boundary), jnp.asarray(lsid),
                                  nentry)
    own_ls = np.asarray(t.owner_lsid)
    own_bid = np.asarray(t.owner_bid)
    bb = np.asarray(t.bb)

    def slot(l, b):
        return (np.uint32(l) * np.uint32(b) & np.uint32(0x7fffffff)) % nentry

    s = slot(7, 100)
    assert own_ls[s] == 7 and own_bid[s] == 100
    # bbox covers the probing pixels of segment 7 (x in 8..17, y == 8)
    assert bb[s, 1] == 17 and bb[s, 3] == 8
    assert w - bb[s, 0] == 8 and h - bb[s, 2] == 8

    s2 = slot(3, 900)
    assert own_ls[s2] == 3 and own_bid[s2] == 900
    # segment 5 never co-occurs with any boundary
    s3 = slot(5, 100)
    assert not (own_ls[s3] == 5 and own_bid[s3] == 100)


def test_rect_frame_detects_quads():
    quads = [[(20, 20), (84, 26), (78, 74), (26, 66)],
             [(110, 40), (170, 50), (160, 120), (116, 106)]]
    bgr = draw_scene(quads)
    res = rect_frame(bgr, TAN)
    rects = live_rects(res)
    screens = [r for r in rects if r["status"] & 1]
    assert len(screens) >= 2

    for q in quads:
        qa = np.asarray(q, np.float64)
        best = 1e9
        for r in screens:
            c2 = r["c2"]
            err = max(min(np.hypot(c2[:, 0] - cx, c2[:, 1] - cy))
                      for cx, cy in qa)
            best = min(best, err)
        assert best < 4.0, (q, best)


def test_rect_frame_no_quads_plain_scene():
    h, w = 144, 192
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([(xx * 255 // w).astype(np.uint8),
                    np.full((h, w), 90, np.uint8),
                    (yy * 255 // h).astype(np.uint8)], axis=-1)
    res = rect_frame(jnp.asarray(rgb), TAN)
    rects = live_rects(res)
    screens = [r for r in rects if r["status"] & 1]
    assert len(screens) == 0


def test_rect_sparse_matches_dense():
    """The sparse/slot-space rect tail must produce the same accepted
    rectangles as the dense formulation (capacity floors cover the whole
    frame at this size, so no truncation is in play)."""
    import dataclasses
    import math
    from rectdetect_tpu.config import DEFAULT_CONFIG

    dense_cfg = dataclasses.replace(DEFAULT_CONFIG, sparse_factor=0)
    tan = math.tan(math.radians(72) / 2)
    r = np.random.default_rng(9)
    for seed in range(3):
        bgr = np.full((80, 112, 3), 75, np.uint8)
        bgr[18:60, 20:64] = (190, 150, 70)
        bgr[30:70, 70:104] = (60, 170, 200)
        bgr = (bgr.astype(np.int16) + np.random.default_rng(seed)
               .integers(-3, 4, bgr.shape, dtype=np.int16)).clip(
                   0, 255).astype(np.uint8)
        a = live_rects(rect_frame(jnp.asarray(bgr), tan))
        b = live_rects(rect_frame(jnp.asarray(bgr), tan, dense_cfg))
        ca = sorted(tuple(np.round(np.sort(np.asarray(x["c2"]), 0).ravel(),
                                   1)) for x in a)
        cb = sorted(tuple(np.round(np.sort(np.asarray(x["c2"]), 0).ravel(),
                                   1)) for x in b)
        assert ca == cb, (seed, ca, cb)
    del r


def test_rect_outline_only_detected_via_polyline_source():
    """An unfilled rectangle outline is found, including by hypothesis
    source B (whole polylines — status bit 2, oclrect.c:1210)."""
    import math
    from PIL import Image, ImageDraw
    img = Image.new("RGB", (128, 96), (80, 80, 80))
    d = ImageDraw.Draw(img)
    d.rectangle([24, 20, 100, 72], outline=(220, 220, 90), width=2)
    bgr = np.asarray(img, np.uint8)[..., ::-1].copy()
    r = np.random.default_rng(0)
    bgr = (bgr.astype(np.int16)
           + r.integers(-3, 4, bgr.shape, dtype=np.int16)).clip(
               0, 255).astype(np.uint8)
    dets = live_rects(rect_frame(jnp.asarray(bgr),
                                 math.tan(math.radians(36))))
    assert dets
    assert any(x["status"] & 2 for x in dets)        # polyline source
    best = min(dets, key=lambda x: np.abs(
        np.sort(np.asarray(x["c2"]), 0)
        - np.sort(np.array([[24, 20], [100, 20], [100, 72], [24, 72]],
                           np.float32), 0)).max())
    err = np.abs(np.sort(np.asarray(best["c2"]), 0)
                 - np.sort(np.array([[24, 20], [100, 20], [100, 72],
                                     [24, 72]], np.float32), 0)).max()
    assert err <= 3.0, err


def test_pair_bbox_table_matches_golden_reduce_ls():
    """ops/reduce_ls.pair_bbox_table vs the loop-level golden emulation
    of the reduceLS hash kernel (golden.rect.reduce_ls_table,
    oclrect.cl:427-464).  On a collision-free instance the two are
    exactly equal: every claimed slot has the same owner lsid and the
    same clip bbox.  (Under collisions the build's min-claimant redesign
    deviates deterministically — documented in ops/reduce_ls.py.)"""
    import numpy as np
    import jax.numpy as jnp
    from golden.rect import reduce_ls_table
    from rectdetect_tpu.ops import reduce_ls

    h, w = 40, 56
    rng = np.random.default_rng(3)
    boundary = np.full((h, w), -1, np.int64)
    boundary[8:12, 6:40] = 333          # two boundary strips
    boundary[20:23, 10:50] = 777
    lsid = np.zeros((h, w), np.int64)
    lsid[10, 8:36] = 4                  # segments riding the strips
    lsid[21, 12:48] = 9
    lsid[15, 5:30] = 2                  # off-strip segment (>3 px away)

    nentry = h * w * 4 // 5
    gold = reduce_ls_table(boundary, lsid, nentry)
    # collision-free by construction: every (lsid,bid) pair has its own
    # slot
    hashes = [(int(a) * int(b)) & 0x7FFFFFFF for a in (4, 9, 2)
              for b in (333, 777)]
    assert len({hh % nentry for hh in hashes}) == len(hashes)

    t = reduce_ls.pair_bbox_table(jnp.asarray(boundary, jnp.int32),
                                  jnp.asarray(lsid, jnp.int32), nentry)
    own = np.asarray(t.owner_lsid)
    bb = np.asarray(t.bb)
    claimed = np.nonzero(gold[:, 0])[0]
    assert len(claimed) >= 2
    for hh in claimed:
        assert own[hh] == gold[hh, 0], hh
        np.testing.assert_array_equal(bb[hh], gold[hh, 1:], err_msg=str(hh))
    # and no spurious claims where golden has none (same pair relation)
    extra = np.nonzero((own > 0) & (gold[:, 0] == 0))[0]
    assert len(extra) == 0


_PINNED_SCRIPT = r"""
import dataclasses, math
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from rectdetect_tpu.config import DEFAULT_CONFIG
from rectdetect_tpu.pipeline import rect as prect

r = np.random.default_rng(9)
bgr = np.full((120, 160, 3), 70, np.uint8)
bgr[22:80, 30:120] = (180, 160, 60)
bgr = (bgr.astype(np.int16)
       + r.integers(-3, 4, bgr.shape, dtype=np.int16)).clip(
           0, 255).astype(np.uint8)
tan = math.tan(math.radians(72) / 2)
want = prect.rect_frame(jnp.asarray(bgr), tan, DEFAULT_CONFIG)
pinned = dataclasses.replace(
    DEFAULT_CONFIG, pin_strings_branch=1, pin_arc_branch=1,
    pin_region_runs=1, pin_walk_tail=1)
got = prect.rect_frame(jnp.asarray(bgr), tan, pinned)
for f in want._fields:
    np.testing.assert_array_equal(
        np.asarray(getattr(want, f)), np.asarray(getattr(got, f)),
        err_msg=f)
pinned2 = dataclasses.replace(pinned, pin_walk_tail=2)
got2 = prect.rect_frame(jnp.asarray(bgr), tan, pinned2)
for f in want._fields:
    np.testing.assert_array_equal(
        np.asarray(getattr(want, f)), np.asarray(getattr(got2, f)),
        err_msg=f)
print("PINNED_OK")
"""


def test_pinned_branches_match_cond_branches():
    """Branch pinning for batched mode (pin_* config fields) must
    reproduce the runtime-cond results exactly when the capacities fit
    (the cond would pick the same branch).  Runs in a fresh subprocess:
    its three full-pipeline compiles would otherwise push an xdist
    worker over the XLA:CPU accumulated-compile segfault threshold
    (CLAUDE.md)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, "-c", _PINNED_SCRIPT],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env, capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PINNED_OK" in out.stdout


def test_first_k_members_matches_matrix_path():
    """The sparse-relation member selection (reduce_ls.first_k_members,
    production) must select exactly what the dense membership-matrix +
    top_k oracle (prect._members_from_matrix) selects: the k smallest
    distinct member lsids per group, plus distinct-member counts."""
    from rectdetect_tpu.pipeline import rect as prect
    r = np.random.default_rng(5)
    n_groups, cap, k = 17, 256, 6
    M = 15 * cap
    g = r.integers(-2, n_groups + 3, M).astype(np.int32)
    lsid = r.integers(0, cap, M).astype(np.int32)
    ids, valid, counts = reduce_ls.first_k_members(
        jnp.asarray(g), jnp.asarray(lsid), n_groups, k, cap)
    # dense oracle
    m = np.zeros((n_groups + 1, cap), bool)
    ok = (g > 0) & (g <= n_groups) & (lsid > 0) & (lsid < cap)
    m[g[ok], lsid[ok]] = True
    ids_o, valid_o = prect._members_from_matrix(jnp.asarray(m),
                                                n_groups, k)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_o))
    # ids compare only where valid (the oracle leaves arbitrary indices
    # in invalid slots)
    iv = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(ids)[iv],
                                  np.asarray(ids_o)[iv])
    counts_o = m.sum(axis=1).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(counts), counts_o)


def test_probe_and_chain_members_match_matrix_path():
    """End-to-end on a real arena: the new probe_members/chain_members
    must reproduce the old probe_membership/chain_membership + top_k."""
    import dataclasses as _dc
    from bench import synth_frame
    from rectdetect_tpu.config import DEFAULT_CONFIG
    from rectdetect_tpu.ops import polyline
    from rectdetect_tpu.pipeline import rect as prect
    from rectdetect_tpu.pipeline.frontend import edge_frontend

    cfg = _dc.replace(DEFAULT_CONFIG, sparse_factor=0)
    h, w = 96, 128
    bgr = jnp.asarray(synth_frame(h, w, seed=3))
    fe = edge_frontend(bgr, cfg)
    arena, lsid = polyline.polyline_execute(
        fe.edge_bin, cfg.minerror_rect, cfg.size_thre_rect,
        cfg.ls_cap_for(w, h), cfg)
    # a simple boundary label image: arbitrary region split
    from rectdetect_tpu.ops import regions, ccl
    seg = jnp.where(jnp.arange(w)[None, :] < w // 2, 1, 2) * \
        jnp.ones((h, 1), jnp.int32)
    bmark = regions.mark_boundary(seg)
    boundary = ccl.label_components(bmark, -1, cfg.ccl_passes,
                                    cfg.ccl_jumps)
    gmax, k = 32, 8
    _, flat2dense, _, _ = reduce_ls.densify_labels(boundary, bg=-1)
    m_a = reduce_ls.probe_membership(boundary, arena, gmax, flat2dense,
                                     cfg.probe_n, cfg.probe_dist)
    ids_o, mv_o = prect._members_from_matrix(m_a, gmax, k)
    counts_o = jnp.sum(m_a, axis=1)
    ids_n, mv_n, counts_n = reduce_ls.probe_members(
        boundary, arena, gmax, flat2dense, k, cfg.probe_n,
        cfg.probe_dist)
    np.testing.assert_array_equal(np.asarray(mv_n), np.asarray(mv_o))
    iv = np.asarray(mv_n)
    np.testing.assert_array_equal(np.asarray(ids_n)[iv],
                                  np.asarray(ids_o)[iv])
    np.testing.assert_array_equal(np.asarray(counts_n),
                                  np.asarray(counts_o))

    m_b, _ = reduce_ls.chain_membership(arena, gmax,
                                        cfg.ls_min_len_polyline)
    idb_o, mvb_o = prect._members_from_matrix(m_b, gmax, k)
    idb_n, mvb_n = reduce_ls.chain_members(arena, gmax, k,
                                           cfg.ls_min_len_polyline)
    np.testing.assert_array_equal(np.asarray(mvb_n), np.asarray(mvb_o))
    ivb = np.asarray(mvb_n)
    np.testing.assert_array_equal(np.asarray(idb_n)[ivb],
                                  np.asarray(idb_o)[ivb])


def test_rect_strings_switch_and_cycle_pin_equal():
    """Round-4 runtime switches must be output-neutral: the rect-strings
    strength-pair capacity switch (all pin values) and the cycle-walk
    skip pin (skip vs always-run on a cycle-free scene) reproduce the
    default path's RectResult exactly."""
    import dataclasses as _dc
    import math as _m
    from bench import synth_frame
    from rectdetect_tpu.config import DEFAULT_CONFIG
    from rectdetect_tpu.pipeline.rect import rect_frame

    bgr = jnp.asarray(synth_frame(120, 160, seed=7))
    tan = _m.tan(_m.radians(72) / 2)
    r0 = rect_frame(bgr, tan, DEFAULT_CONFIG)
    variants = [
        _dc.replace(DEFAULT_CONFIG, rect_strings_small=3,
                    pin_rect_strings=p) for p in (0, 1, 2)
    ] + [
        _dc.replace(DEFAULT_CONFIG, pin_cycle_walk=2),
    ]
    for cfg in variants:
        r1 = rect_frame(bgr, tan, cfg)
        for f in r0._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(r0, f)), np.asarray(getattr(r1, f)),
                err_msg=f"{cfg.rect_strings_small},"
                        f"{cfg.pin_rect_strings},{cfg.pin_cycle_walk},{f}")
