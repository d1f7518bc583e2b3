"""Pallas two-level exact CCL vs the golden union-find oracles.

Runs in interpret mode on CPU; bh is forced small so the seam-union +
seeded re-flood path (the multi-block machinery) is exercised, not just
the single-block fast path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from golden import labeling as G
from golden import polyline as gpoly
from rectdetect_tpu.ops import pallas_ccl as P
from tests.test_ccl import _random_blobs, _spiral


@pytest.mark.parametrize("bh", [8, 16, None])
def test_exact_ccl_blobs(bh):
    pix = _random_blobs()
    got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=bh))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bh", [8, None])
def test_exact_ccl_spiral(bh):
    pix = _spiral()
    got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=bh))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_exact_ccl_multivalue():
    r = np.random.default_rng(5)
    pix = r.integers(0, 3, (28, 36)).astype(np.int32)
    got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=8))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_exact_ccl_vertical_chains_cross_every_seam():
    # worst case for the seam machinery: every component crosses every
    # seam (vertical stripes), plus a zig-zag that snakes across blocks
    h, w = 40, 24
    pix = np.zeros((h, w), np.int32)
    pix[:, ::3] = 1
    pix[7, :] = 1          # connect them all inside block 0
    got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=8))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_exact_ccl_diagonal_seam_links():
    # components connected ONLY diagonally across block seams
    h, w = 16, 16
    pix = np.zeros((h, w), np.int32)
    for i in range(min(h, w)):
        pix[i, i] = 1
    pix[7, 8] = 0           # ensure the only link at the seam is diagonal
    got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=8))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_exact_ccl_nonmultiple_height():
    # h not a multiple of bh: last block is padded rows
    pix = _random_blobs(h=29, w=40, seed=11)
    got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=8))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_exact_ccl_empty_and_full():
    for pix in (np.zeros((16, 24), np.int32), np.ones((16, 24), np.int32)):
        got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=8))
        want = G.label_components(pix, 0)
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bh", [8, None])
def test_links_label_merge(bh):
    from golden import regions as greg
    from tests.test_regions import make_scene

    packed, edge = make_scene(h=40, w=48)
    pix = packed.astype(np.int32)
    mask = np.zeros_like(pix)
    mask[10:14, 20:30] = 1
    elab = (edge > 0).astype(np.int32) * 7
    want = greg.label_merge(pix, mask, elab)
    got = np.asarray(P.label_merge_exact(
        jnp.asarray(pix), jnp.asarray(mask), jnp.asarray(elab), bh=bh))
    np.testing.assert_array_equal(got, want)


def test_links_side_asymmetry_adversarial():
    # mirror of test_regions.py::test_label_merge_side_asymmetry_adversarial
    from golden import regions as greg

    r = np.random.default_rng(19)
    h, w = 33, 40
    pix = r.integers(0, 2, (h, w)).astype(np.int32)
    mask = (r.random((h, w)) < 0.1).astype(np.int32)
    elab = (r.random((h, w)) < 0.2).astype(np.int32) * 5
    want = greg.label_merge(pix, mask, elab)
    got = np.asarray(P.label_merge_exact(
        jnp.asarray(pix), jnp.asarray(mask), jnp.asarray(elab), bh=8))
    np.testing.assert_array_equal(got, want)


def test_exact_arcs():
    from golden.imgutil import __name__ as _  # noqa: F401  (import check)
    from tests.test_polyline import labeled  # fixture function, call body
    # build a numbered string scene the same way test_polyline does
    from golden import labeling as gl
    from rectdetect_tpu.ops import morphology as M, ccl as tccl
    import jax.numpy as jnp

    r = np.random.default_rng(7)
    img = (r.random((32, 40)) < 0.35).astype(np.int32)
    jn = gl.simple_junction(img)
    conn = gl.simple_connect_poly(jn)
    s = gl.stringify(gl.stringify(conn, 0), 1)
    s = gl.remove_branch(s)
    lab = G.label_components(s.astype(np.int32), 0)
    number = gpoly.arc_number(np.where(lab >= 0, lab, -1))
    want = gpoly.label_arcs(number)
    got = np.asarray(P.label_arcs_exact(jnp.asarray(number.astype(np.int32)),
                                        bh=8))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Round-capped variants (the reference's own MAXPASS=10 trade,
# oclimgutil.c:229-238): piece labels must partition exact components, and
# the strength-filter OUTPUT must match the converged labeling once the cap
# covers the piece-strength threshold.
# ---------------------------------------------------------------------------


def _strength_keep(edge, lbl, thre):
    from rectdetect_tpu.ops import ccl as C
    st = C.calc_strength(jnp.asarray(edge), jnp.asarray(lbl))
    return np.asarray(C.filter_strength(jnp.asarray(lbl), st, thre) > 0)


def test_pieces_partition_exact_components():
    # every capped piece lies inside exactly one exact component
    pix = _random_blobs(h=48, w=64, seed=11)
    ex = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=16))
    pc = np.asarray(P.label_components_pieces(jnp.asarray(pix), 0,
                                              round_cap=3, bh=16))
    assert np.array_equal(pc >= 0, ex >= 0)
    for v in np.unique(pc[pc >= 0]):
        owners = np.unique(ex[pc == v])
        assert owners.size == 1, f"piece {v} spans components {owners}"


def test_pieces_strength_filter_contract():
    """The capped-pieces strength filter is (a) conservative — it never
    keeps a pixel the converged filter would kill (piece strength <=
    component strength) — and (b) exact on scenes whose components
    converge within the cap.  On percolated noise it kills MORE than the
    converged filter (a documented deviation; the reference's MAXPASS=10
    labeling is itself unconverged there, oclimgutil.c:229-238)."""
    r = np.random.default_rng(23)
    # (a) adversarial noise: subset property
    pix = (r.random((96, 128)) < 0.3).astype(np.int32)
    edge = (r.random((96, 128)) * 0.3 + 0.1).astype(np.float32)
    ex = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=32))
    pc = np.asarray(P.label_components_pieces(jnp.asarray(pix), 0,
                                              round_cap=8, bh=32))
    keep_ex = _strength_keep(edge, ex, 500)
    keep_pc = _strength_keep(edge, pc, 500)
    assert not np.any(keep_pc & ~keep_ex)
    # (b) clean structures: exact equality.  Pieces split at block seams
    # too (not just at the round cap), so equality needs every component
    # to be unambiguous: pieces of a kept component must each clear the
    # threshold (the rectangle frame: 2500/px) and a killed component
    # must be below it as a WHOLE (the 5x5 blob at 0.04 -> 25*16 = 400 <
    # 500; it deliberately straddles the bh=32 seam to pin the
    # seam-split-still-killed case).  A component whose total clears the
    # threshold but whose seam pieces don't is the documented
    # conservative deviation covered by (a).
    pix2 = np.zeros((96, 128), np.int32)
    pix2[10, 10:110] = 1
    pix2[60, 10:110] = 1
    pix2[10:61, 10] = 1
    pix2[10:61, 109] = 1
    pix2[30:35, 50:55] = 1          # small weak blob -> filtered out
    edge2 = np.where(pix2 != 0, 0.5, 0.0).astype(np.float32)
    edge2[30:35, 50:55] = 0.04
    ex2 = np.asarray(P.label_components_exact(jnp.asarray(pix2), 0, bh=32))
    pc2 = np.asarray(P.label_components_pieces(jnp.asarray(pix2), 0,
                                               round_cap=48, bh=32))
    np.testing.assert_array_equal(
        _strength_keep(edge2, pc2, 500), _strength_keep(edge2, ex2, 500))


def test_round_cap_actually_truncates():
    """A small round_cap must bound the flood rounds (regression: commit
    c2d0f3e dropped round_cap forwarding at the _run_blocks call sites,
    so caller caps were silently ignored and floods ran to the
    effectively-unbounded default).  On percolated noise, bh=64 (single
    block — no seam splitting) with cap=2 must yield strictly more
    pieces than the uncapped flood, and stay a refinement of it."""
    r = np.random.default_rng(5)
    pix = (r.random((64, 64)) < 0.55).astype(np.int32)
    capped = np.asarray(P.label_components_pieces(jnp.asarray(pix), 0,
                                                  round_cap=2, bh=64))
    uncapped = np.asarray(P.label_components_pieces(jnp.asarray(pix), 0,
                                                    round_cap=100000,
                                                    bh=64))
    n_capped = np.unique(capped[capped >= 0]).size
    n_uncapped = np.unique(uncapped[uncapped >= 0]).size
    assert n_capped > n_uncapped, (n_capped, n_uncapped)
    for v in np.unique(capped[capped >= 0]):
        owners = np.unique(uncapped[capped == v])
        assert owners.size == 1, f"piece {v} spans {owners}"
    # the two-level path (label_blocked via label_components_exact) must
    # forward the cap too: a capped two-level on the same scene is also
    # a strict refinement
    capped2 = np.asarray(P.label_components_exact(jnp.asarray(pix), 0,
                                                  bh=16, round_cap=2))
    exact = np.asarray(P.label_components_exact(jnp.asarray(pix), 0,
                                                bh=16))
    n2 = np.unique(capped2[capped2 >= 0]).size
    ne = np.unique(exact[exact >= 0]).size
    assert n2 > ne, (n2, ne)


def test_capped_two_level_converges_on_clean_structures():
    # a multi-block rectangle boundary strip converges way below the cap
    h, w = 64, 48
    pix = np.zeros((h, w), np.int32)
    pix[5:60, 4:44] = 1
    pix[8:57, 7:41] = 0
    got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=8,
                                              round_cap=32))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_inner_nb_exactness():
    pix = _random_blobs(h=40, w=48, seed=31)
    want = G.label_components(pix, 0)
    got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=16,
                                              inner_nb=4))
    np.testing.assert_array_equal(got, want)


def test_rounds_output_diagnostic():
    pix = _random_blobs(h=32, w=40, seed=7)
    out, rounds = P._run_blocks(jnp.asarray(pix), None, bgc=0, mode="equal",
                                bh=8, interpret=True, want_rounds=True)
    assert rounds.shape == (4,)
    assert bool(jnp.all(rounds >= 1))
    ex = P.label_components_exact(jnp.asarray(pix), 0, bh=8)
    # unseeded block labels agree with exact inside each block's interior
    assert out.shape == pix.shape


def test_sparse_resolve_matches_two_level():
    # comp-based finalization (seam-table resolve) == seeded second flood
    from rectdetect_tpu.ops.compact import compact_mask
    pix = _random_blobs(h=72, w=64, seed=19)
    want = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=16))
    comp = compact_mask(jnp.asarray(pix != 0).reshape(-1), 4096)
    got = np.asarray(P.label_components_exact(jnp.asarray(pix), 0, bh=16,
                                              comp=comp))
    np.testing.assert_array_equal(want, got)


def test_sparse_resolve_arcs_matches_two_level():
    from rectdetect_tpu.ops.compact import compact_mask
    from rectdetect_tpu.ops import gradient  # noqa: F401  (import parity)
    r = np.random.default_rng(5)
    # synthetic number map: slanted chains with consecutive numbering
    num = np.zeros((64, 80), np.int32)
    for k in range(6):
        y0, x0 = r.integers(2, 50), r.integers(2, 30)
        L = int(r.integers(10, 40))
        for i in range(L):
            y, x = y0 + i // 3, x0 + i
            if y < 62 and x < 78:
                num[y, x] = i + 1
    want = np.asarray(P.label_arcs_exact(jnp.asarray(num), bh=16))
    comp = compact_mask(jnp.asarray(num > 0).reshape(-1), 2048)
    got = np.asarray(P.label_arcs_exact(jnp.asarray(num), bh=16, comp=comp))
    np.testing.assert_array_equal(want, got)
