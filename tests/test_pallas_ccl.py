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
