"""VMEM block-budget regression tests (the BENCH_r01 failure mode).

Round 1 shipped a compile-time scoped-VMEM OOM because the morph-chain
block clamp used a stale copy of the bridge2 budget constant.  The
budgets now live in ops/vmem.py and every kernel picks/asserts its block
through it, so a violation is a loud trace-time ValueError on any
backend.  These tests pin the exact r01 case and sweep the block math
over the resolution grid the TPU smoke tool compiles
(tools/vmem_smoke.py)."""

import pytest

from rectdetect_tpu.ops import vmem

RESOLUTIONS = [(720, 1280), (1080, 1920), (2160, 3840)]


def test_r01_bridge2_block_fits():
    """The exact r01 OOM: 720p, bridge2 halo q=16, requested bh=128,
    at the 16 MiB default Mosaic limit.  The buggy clamp picked 112
    ((112+32)*1280 = 184320 > 174080); the correct pick is 104
    ((104+32)*1280 = 174080, exactly at budget)."""
    lim = vmem.VMEM_LIMIT_BYTES
    bh = vmem.pick_block_rows("morph_chain_bridge2", 128, 1280,
                              halo=16, min_rows=32, h=720, limit=lim)
    assert bh == 104
    assert (bh + 32) * 1280 <= vmem.budget_elems("morph_chain_bridge2",
                                                 limit=lim)


def test_r01_rebreak_detected():
    """Re-breaking the r01 bug (a block chosen against the WRONG budget)
    now fails loudly at trace time instead of compiling to a TPU OOM."""
    with pytest.raises(ValueError, match="morph_chain_bridge2"):
        # the buggy pick: 112 rows + 2*16 halo at w=1280
        vmem.assert_fits("morph_chain_bridge2", (112 + 32) * 1280,
                         limit=vmem.VMEM_LIMIT_BYTES)


@pytest.mark.parametrize("h,w", RESOLUTIONS)
@pytest.mark.parametrize("kernel,halo,min_rows", [
    ("morph_chain", 8, 16),
    ("morph_chain_branch", 8, 16),
    ("morph_chain_bridge2", 16, 32),
    ("morph_chain_branch_bridge2", 16, 32),
    ("quant_despeckle", 8, 16),
])
def test_block_pick_fits_everywhere(h, w, kernel, halo, min_rows):
    if not vmem.min_window_fits(kernel, w, halo=halo, min_rows=min_rows):
        pytest.skip("width-chunk fallback engages at this width")
    bh = vmem.pick_block_rows(kernel, 128, w, halo=halo,
                              min_rows=min_rows, h=h)
    assert (bh + 2 * halo) * w <= vmem.budget_elems(kernel)
    assert bh >= min_rows and bh % 8 == 0


@pytest.mark.parametrize("h,w", RESOLUTIONS)
def test_padded_width_kernels_fit(h, w):
    """merge_mask / distinct_bids / thin / edge_front pad width to a
    lane multiple; their picks must fit at every resolution."""
    import math

    def wp(extra):
        return math.ceil((w + extra) / 128) * 128

    for kernel, halo, min_rows, pad in [("merge_mask", 9, 24, 18),
                                        ("distinct_bids", 3, 8, 6),
                                        ("thin", 0, 8, 8),
                                        ("edge_front", 0, 8, 4)]:
        wpad = wp(pad)
        if not vmem.min_window_fits(kernel, wpad, halo=halo,
                                    min_rows=min_rows):
            continue                       # chunked path
        bh = vmem.pick_block_rows(kernel, 128, wpad, halo=halo,
                                  min_rows=min_rows, h=h)
        assert (bh + 2 * halo) * wpad <= vmem.budget_elems(kernel)


def test_ccl_explicit_bh_clamped():
    """A caller-supplied block height tuned at one width (per-instance
    config defaults, the calibrated plan's ccl_bh) is clamped to the
    largest legal block at the actual width instead of tripping the
    VMEM assert — the r02 res-sweep failure mode."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops.pallas_ccl import (label_components_pieces,
                                               label_components_exact)

    pix = jnp.zeros((64, 16384), jnp.int32)
    out = label_components_pieces(pix, bgc=0, round_cap=48, bh=128)
    assert np.asarray(out).shape == (64, 16384)
    out = label_components_exact(jnp.zeros((64, 3840), jnp.int32),
                                 bgc=0, bh=256)
    assert np.asarray(out).shape == (64, 3840)


def test_budget_scales_with_limit():
    base = vmem.budget_elems("morph_chain", limit=vmem.VMEM_LIMIT_BYTES)
    # extrapolation above the measured baseline keeps a 10% margin
    assert vmem.budget_elems(
        "morph_chain",
        limit=2 * vmem.VMEM_LIMIT_BYTES) == 2 * base * 9 // 10
    # the kernel default limit is the raised one
    assert vmem.budget_elems("morph_chain") == \
        vmem.budget_elems("morph_chain",
                          limit=vmem.KERNEL_VMEM_LIMIT_BYTES)
