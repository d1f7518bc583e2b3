"""Width-aware VMEM block budgets: every row-block Pallas kernel must
pick a legal block height at 1080p/4K widths (1080p OOMed the scoped
VMEM stack before the budgets existed).  Interpret mode only checks the
shape/blocking logic; the budgets themselves are measured constants."""

import numpy as np
import jax.numpy as jnp


import pytest


@pytest.mark.parametrize("w", [1920, 3840])
def test_wide_kernels_run(w):
    h = 40
    r = np.random.default_rng(3)

    from rectdetect_tpu.ops.pallas_morph import (
        morph_chain_pallas, merge_mask_pallas, distinct_bids_pallas,
        quant_despeckle_pallas)
    eb = (r.random((h, w)) < 0.2).astype(np.int32)
    assert np.asarray(morph_chain_pallas(jnp.asarray(eb), "rect")).shape \
        == (h, w)
    sl = (eb * r.integers(1, 99, (h, w))).astype(np.int32)
    assert np.asarray(merge_mask_pallas(jnp.asarray(sl))).shape == (h, w)
    assert np.asarray(distinct_bids_pallas(jnp.asarray(sl))[0]).shape \
        == (h, w)
    packed = r.integers(0, 2**30, (h, w)).astype(np.int32)
    em = r.random((h, w)).astype(np.float32)
    assert np.asarray(quant_despeckle_pallas(
        jnp.asarray(packed), jnp.asarray(em))).shape == (h, w)

    from rectdetect_tpu.ops.pallas_thin import thinthres_pallas
    from rectdetect_tpu.ops.pallas_grad import edge_front_pallas
    from rectdetect_tpu.ops import gradient
    vec = gradient.edgevec(jnp.asarray(em))
    assert np.asarray(thinthres_pallas(jnp.asarray(em), vec)).shape \
        == (h, w)
    labb = jnp.asarray(r.random((h, w, 3)).astype(np.float32))
    em2, vec2 = edge_front_pallas(labb)
    assert np.asarray(em2).shape == (h, w)
    assert np.asarray(vec2).shape == (h, w, 2)


def test_morph_chain_bridge2_wide_fallback():
    """At >=4K widths the bridge2 halo cannot fit the morph kernel's VMEM
    budget; the jnp fallback must produce identical strings."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops import morphology
    from rectdetect_tpu.ops.pallas_morph import morph_chain_pallas, _HALO_B2

    w = 3840
    assert 4 * _HALO_B2 * w > 184320       # the fallback branch fires
    r = np.random.default_rng(1)
    eb = jnp.asarray((r.random((24, w)) < 0.2).astype(np.int32))
    a = np.asarray(morphology.strings_chain(eb, "rect", bridge2=True))
    b = np.asarray(morph_chain_pallas(eb, "rect", bridge2=True))
    np.testing.assert_array_equal(a, b)


def test_wide_kernels_chunked_bit_exact():
    """merge mask, quantize/despeckle and NMS thinning exceed their VMEM
    budgets at >=4K widths and switch to width-chunked kernel calls with
    real halo columns — all bit-exact vs the jnp formulations."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.core import color
    from rectdetect_tpu.ops import gradient, morphology, regions, thin
    from rectdetect_tpu.ops.pallas_morph import (merge_mask_pallas,
                                                 quant_despeckle_pallas)
    from rectdetect_tpu.ops.pallas_thin import thinthres_pallas

    w, h = 3840, 24
    r = np.random.default_rng(2)

    lbl = jnp.asarray(r.integers(-1, 30, (h, w)).astype(np.int32))
    a = np.asarray(regions.merge_mask(
        morphology.simple_junction(lbl, positive_only=True)))
    b = np.asarray(merge_mask_pallas(lbl))
    np.testing.assert_array_equal(a, b, err_msg="merge_mask")

    packed = jnp.asarray(r.integers(0, 2 ** 31 - 1, (h, w)).astype(np.int32))
    emag = jnp.asarray((r.random((h, w)) * 0.5).astype(np.float32))
    a = np.asarray(regions.despeckle(regions.quantize_packed(packed), emag))
    b = np.asarray(quant_despeckle_pallas(packed, emag))
    np.testing.assert_array_equal(a, b, err_msg="quant_despeckle")

    em = jnp.asarray((r.random((h, w)).astype(np.float32)))
    vec = gradient.edgevec(em)
    a = np.asarray(thin.thinthres(em, vec))
    b = np.asarray(thinthres_pallas(em, vec))
    np.testing.assert_allclose(a, b, atol=1e-6, err_msg="thinthres")
