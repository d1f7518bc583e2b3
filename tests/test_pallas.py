"""Pallas kernels vs their XLA formulations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from rectdetect_tpu.ops import regions
from rectdetect_tpu.ops.pallas_blblur import blblur_pallas
from tests.test_regions import make_scene


def test_pallas_blblur_bit_exact():
    packed, edge = make_scene()
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.int32))
    a = np.asarray(regions.blblur(p, e, 3))
    b = np.asarray(blblur_pallas(p, e, 3))
    np.testing.assert_array_equal(a, b)


def test_pallas_blblur_full_iters():
    packed, edge = make_scene(h=36, w=48)
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.int32))
    a = np.asarray(regions.blblur(p, e, 10))
    b = np.asarray(blblur_pallas(p, e, 10))
    np.testing.assert_array_equal(a, b)


def test_pallas_blblur_blocked_bit_exact():
    from rectdetect_tpu.ops.pallas_blblur import blblur_pallas_blocked
    packed, edge = make_scene(h=40, w=48)
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.int32))
    a = np.asarray(regions.blblur(p, e, 10))
    b = np.asarray(blblur_pallas_blocked(p, e, 10, block=16))
    np.testing.assert_array_equal(a, b)


def test_pallas_blblur_fused_bit_exact():
    """Fused multi-iteration form: halo'd row blocks, F iterations per
    launch — bit-exact vs the XLA oracle for every fuse factor and a
    block that forces multiple halo'd grid steps."""
    from rectdetect_tpu.ops.pallas_blblur import blblur_pallas_fused
    packed, edge = make_scene(h=120, w=48)
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.int32))
    a = np.asarray(regions.blblur(p, e, 10))
    for fuse in (1, 2, 5):
        b = np.asarray(blblur_pallas_fused(p, e, 10, fuse=fuse, block=40))
        np.testing.assert_array_equal(a, b)


def test_pallas_blblur_blocked_tall_transposed():
    """Frames taller than _TALL_H run the V pass as the H kernel on
    transposed inputs — must stay bit-exact (shape chosen to avoid the
    jit cache of the untransposed test)."""
    import rectdetect_tpu.ops.pallas_blblur as B
    packed, edge = make_scene(h=48, w=40)
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.int32))
    a = np.asarray(regions.blblur(p, e, 10))
    old = B._TALL_H
    B._TALL_H = 16
    try:
        b = np.asarray(B.blblur_pallas_blocked(p, e, 10, block=16))
    finally:
        B._TALL_H = old
    np.testing.assert_array_equal(a, b)


def _rand_edge(h, w, seed=0, p=0.3):
    r = np.random.default_rng(seed)
    return (r.random((h, w)) < p).astype(np.int32)


def test_pallas_morph_rect_variant():
    from rectdetect_tpu.ops import morphology as M
    from rectdetect_tpu.ops.pallas_morph import morph_chain_pallas
    eb = jnp.asarray(_rand_edge(48, 64, seed=1))
    want = M.stringify(M.stringify(M.simple_connect_rect(
        M.simple_junction(eb, positive_only=True)), 0), 1)
    got = morph_chain_pallas(eb, "rect", bh=16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_morph_poly_branch_variant():
    from rectdetect_tpu.ops import morphology as M
    from rectdetect_tpu.ops.pallas_morph import morph_chain_pallas
    eb = jnp.asarray(_rand_edge(40, 56, seed=2, p=0.35))
    want = M.remove_branch(M.stringify(M.stringify(M.simple_connect_poly(
        M.simple_junction(eb)), 0), 1))
    got = morph_chain_pallas(eb, "poly_branch", bh=16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_morph_odd_size_single_block():
    from rectdetect_tpu.ops import morphology as M
    from rectdetect_tpu.ops.pallas_morph import morph_chain_pallas
    eb = jnp.asarray(_rand_edge(37, 53, seed=3))
    want = M.stringify(M.stringify(M.simple_connect_rect(
        M.simple_junction(eb, positive_only=True)), 0), 1)
    got = morph_chain_pallas(eb, "rect")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_quant_despeckle_bit_exact():
    from rectdetect_tpu.ops import regions
    from rectdetect_tpu.ops.pallas_morph import quant_despeckle_pallas
    packed, edge = make_scene(h=44, w=56)
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.float32)) * 0.37
    want = regions.despeckle(regions.quantize_packed(p), e)
    got = quant_despeckle_pallas(p, e, bh=16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_quant_despeckle_odd_size():
    from rectdetect_tpu.ops import regions
    from rectdetect_tpu.ops.pallas_morph import quant_despeckle_pallas
    packed, edge = make_scene(h=37, w=53)
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.float32))
    want = regions.despeckle(regions.quantize_packed(p), e)
    got = quant_despeckle_pallas(p, e, bh=16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_blblur_blocked_offset_form():
    """The width-tile offset form (traced x0 coordinate map + true frame
    width) matches the jnp offset path bit-exactly."""
    import jax
    from rectdetect_tpu.ops.pallas_blblur import blblur_pallas_blocked
    packed, edge = make_scene(h=32, w=64)
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.int32))
    x0, wt = jnp.int32(48), 200      # a slice of a 200-wide frame

    def body(_, pp):
        pp = regions._blblur_axis(pp, e, True, x0, wt)
        pp = regions._blblur_axis(pp, e, False, x0, wt)
        return pp

    a = np.asarray(jax.lax.fori_loop(0, 3, body, p))
    b = np.asarray(blblur_pallas_blocked(p, e, 3, block=16, x0=x0,
                                         w_total=wt))
    np.testing.assert_array_equal(a, b)


def test_pallas_morph_offset_form():
    """morph_chain_pallas with a global-x column map == the offset jnp
    chain (border guards + stringify parity are frame-global)."""
    from rectdetect_tpu.ops import morphology
    from rectdetect_tpu.ops.pallas_morph import morph_chain_pallas
    eb = jnp.asarray(_rand_edge(40, 48, seed=3))
    x0, wt = jnp.int32(33), 160      # odd offset flips the checkerboard

    def jnp_chain(x):
        s = morphology.stringify(morphology.simple_connect_rect(
            morphology.simple_junction(x, positive_only=True, x0=x0,
                                       w_total=wt), x0, wt), 0, x0, wt)
        return morphology.stringify(s, 1, x0, wt)

    a = np.asarray(jnp_chain(eb))
    b = np.asarray(morph_chain_pallas(eb, "rect", x0=x0, w_total=wt))
    np.testing.assert_array_equal(a, b)
