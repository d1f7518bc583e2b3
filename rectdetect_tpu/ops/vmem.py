"""Analytic VMEM block budgeting for the Pallas TPU kernels.

Every Pallas kernel in ops/ holds some number of live block-sized
buffers in the 16 MiB scoped-VMEM stack (Mosaic's default per-kernel
limit).  Round 1 kept a hand-measured "max block elements" constant at
each call site; one stale copy of one constant shipped a compile-time
VMEM OOM to the bench (morph_chain bridge2, BENCH_r01).  This module is
now the single source of truth:

  * `budget_elems(kernel)` — the measured max block window (elements)
    for each kernel at the default limit, scaled if the caller raises
    `vmem_limit_bytes` via `pltpu.CompilerParams`;
  * `pick_block_rows(kernel, ...)` — the shared block-height chooser,
    which ASSERTS the chosen window fits at trace time, so a violation
    is a loud Python error on any backend (including the CPU/interpret
    test suite) instead of a TPU-only compile failure;
  * `assert_fits(kernel, elems)` — the bare trace-time check, for
    kernels whose block choice is not row-shaped.

The measured budgets come from compiling each kernel on a v5e and
binary-searching the largest window that fits (bytes/elem ~= live
block buffers x 4 at the shipping kernel shape).  tools/vmem_smoke.py
re-validates all of them by AOT-compiling every kernel at
{720p, 1080p, 4K} x {bridge2 on/off} on the real TPU — run it after
changing any kernel body (a new live temporary changes the factor).

Reference analog: the per-kernel local-work-size legality fallback in
runKernel1Dx/2Dx (oclhelper.c:631-633, 686-688).
"""

from __future__ import annotations

# Mosaic's default scoped-vmem stack — the limit the budgets below were
# MEASURED against.
VMEM_LIMIT_BYTES = 16 * 1024 * 1024

# The limit the kernels actually run with: v5e cores have 128 MB of
# physical VMEM and the 16 MB default is just a conservative stack cap;
# raising it via CompilerParams removes the whole class of
# at-the-boundary OOMs (lane-padding pushed a 4K chunk 0.2% over) and
# lets wide frames run un-chunked.  Verified on hardware by
# tools/vmem_smoke.py.
KERNEL_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def compiler_params():
    """CompilerParams raising the scoped-vmem stack to the kernel limit.
    Pass to every pallas_call whose block budget comes from this
    module."""
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(
        vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES)

# Measured max block-window elements at the default 16 MiB scoped limit
# (largest (rows + 2*halo) x padded-width that compiles on TPU v5e).
_MEASURED = {
    "morph_chain": 184320,           # rect/poly variants
    "morph_chain_branch": 163840,    # + removeBranch degree maps
    "morph_chain_bridge2": 174080,   # connect2 adds live degree maps
    "morph_chain_branch_bridge2": 174080,
    "quant_despeckle": 102400,
    "merge_mask": 115456,
    "distinct_bids": 98560,
    "thin": 22528,                   # 16 bicubic weight maps + em8 stack
    "edge_front": 45056,
    "blblur_pass": 64 * 1280,        # horizontal pass (rows x W)
    "blblur_pass_v": 128 * 1280,     # vertical pass (H x cols, H <= 1280)
    "blblur_fused": 64 * 1280,       # fused form: same ~25-buffer live set
                                     # per pass (window = (bh+2*halo) x W)
    "ccl_flood": 96 * 1280,
    "ccl_merge": 96 * 1280,          # links-mode flood (label_merge_exact)
}


def budget_elems(kernel: str,
                 limit: int = KERNEL_VMEM_LIMIT_BYTES) -> int:
    """Max block-window elements for `kernel` under a `limit`-byte
    scoped-VMEM stack.  Live-buffer bytes scale linearly with the
    window; extrapolation beyond the measured 16 MiB baseline keeps a
    10% margin (per-buffer lane/sublane padding and fixed costs are not
    exactly linear — a 4K block at the extrapolated edge OOM'd by 0.2%
    without it)."""
    if limit == VMEM_LIMIT_BYTES:
        return _MEASURED[kernel]
    return _MEASURED[kernel] * limit * 9 // (VMEM_LIMIT_BYTES * 10)


def assert_fits(kernel: str, elems: int,
                limit: int = KERNEL_VMEM_LIMIT_BYTES) -> None:
    """Trace-time guard: raise if a block window exceeds the kernel's
    measured VMEM budget (the r01 failure mode, as a local error)."""
    b = budget_elems(kernel, limit)
    if elems > b:
        raise ValueError(
            f"pallas kernel {kernel!r}: block window of {elems} elements "
            f"exceeds the measured scoped-VMEM budget of {b} "
            f"({limit} bytes); shrink the block or width-chunk the input")


def min_window_fits(kernel: str, w: int, *, halo: int = 0,
                    min_rows: int = 8,
                    limit: int = KERNEL_VMEM_LIMIT_BYTES) -> bool:
    """Does the MINIMAL legal block fit?  False means the caller must
    width-chunk (its halo'd fallback path)."""
    return (min_rows + 2 * halo) * w <= budget_elems(kernel, limit)


def pick_block_rows(kernel: str, bh_req: int, w: int, *, halo: int = 0,
                    min_rows: int = 8, h: int | None = None,
                    align: int = 8,
                    limit: int = KERNEL_VMEM_LIMIT_BYTES) -> int:
    """Choose a legal block height: the requested bh, clamped so the
    (bh + 2*halo) x w window fits the kernel's budget, floored at
    min_rows (typically 2*halo so rolled-copy reconstruction covers the
    window) and capped at the padded frame height.  Asserts the result
    at trace time."""
    budget = budget_elems(kernel, limit)
    cap = (budget // max(w, 1) - 2 * halo) // align * align
    bh = min(bh_req, max(min_rows, cap))
    if h is not None:
        bh = min(bh, max(align, (h + align - 1) // align * align))
    bh = max(min_rows, bh)
    bh = (bh + align - 1) // align * align
    assert_fits(kernel, (bh + 2 * halo) * w, limit)
    return bh
