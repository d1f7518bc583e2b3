"""Pallas TPU kernel for NMS edge thinning (thinthres / thincubic).

The XLA formulation (ops/thin.py) evaluates 4 bicubic samples as 64
statically shifted multiply-adds each — 256 pad/slice stencil reads plus
~64 weight maps, all materialized through HBM.  This kernel keeps one row
block in VMEM and turns every tap into a lane roll:

  * y taps (offsets -3..+4) come from 8 globally pre-shifted copies of the
    edge image, built once in XLA from the SAME reflect-101 padding as the
    reference (mirror(), oclimgutil.cl:41-45) — so boundary semantics are
    bit-identical to ops/thin.py;
  * x taps are jnp.roll within the block; the image is pre-padded by 4
    mirror columns so rolled wrap-around values are never read by a valid
    output column;
  * the 64 tap rolls are shared by all four sample offsets k in
    {-2,-1,1,2} (the XLA path re-derives them per k and relies on CSE).

Accumulation order (a ascending inside b ascending, row sums scaled by the
y weight) matches ops/thin.py exactly; residual differences are FMA-
contraction ulp, so tests use the same tolerance contract as the XLA path
has vs the golden oracle (tests/test_pallas_thin.py).

Reference: thinthres_f_f_f2 oclimgutil.cl:456-471, thincubic_float_float
oclimgutil.cl:473-491, bicubic oclimgutil.cl:65-94.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rectdetect_tpu.ops.shifts import pad2d
from rectdetect_tpu.ops import vmem
from rectdetect_tpu.ops.thin import _axis_weights

_R = 4          # tap offsets span [-3, +4] (ops/thin.py)
_KS = (-2.0, -1.0, 1.0, 2.0)


def _thin_kernel(em8_ref, vx_ref, vy_ref, out_ref, *, bh: int, mode: str,
                 slack: float):
    blk = pl.program_id(0)
    em8 = em8_ref[:]                    # (8, bh, wp): y-offsets -3..+4
    vx = vx_ref[:]
    vy = vy_ref[:]
    bhh, wp = vx.shape

    # true pixel coordinates (the weight placement truncates the absolute
    # position, ops/thin.py:_axis_weights)
    xcoord = (jax.lax.broadcasted_iota(jnp.int32, (bhh, wp), 1) - _R
              ).astype(vx.dtype)
    ycoord = (jax.lax.broadcasted_iota(jnp.int32, (bhh, wp), 0) + blk * bh
              ).astype(vx.dtype)

    # one sample offset k at a time: the 16 live weight maps + the em8
    # block fit the VMEM scoped stack at bh=16 (28 MB measured at bh=64)
    acc = []
    for k in _KS:
        wxs = _axis_weights(k * vx, xcoord)              # [a] (bh, wp)
        wys = _axis_weights(k * vy, ycoord)
        s = jnp.zeros((bhh, wp), vx.dtype)
        for b in range(8):              # y offset b-3
            emb = em8[b]
            row = jnp.zeros((bhh, wp), vx.dtype)
            for a in range(8):          # x offset a-3
                # Mosaic rejects roll-by-0 (zero-size slice)
                tap = emb if a == 3 else jnp.roll(emb, 3 - a, axis=1)
                row = row + wxs[a] * tap
            s = s + wys[b] * row
        acc.append(s)

    am2, am1, ap1, ap2 = acc
    a0 = em8[3]                         # y offset 0, unshifted
    if mode == "thres":
        keep = (am1 <= a0) & (a0 >= ap1)
    else:
        keep = ((am2 * slack <= a0) & (am1 * slack <= a0) &
                (a0 >= ap1 * slack) & (a0 >= ap2 * slack))
    out_ref[:] = jnp.where(keep, am2 + am1 + a0 + ap1 + ap2, 0.0)


@functools.partial(jax.jit, static_argnames=("mode", "slack", "bh"))
def _thin_pallas(edge_img, vec, mode: str, slack: float, bh: int):
    h, w = edge_img.shape
    wp = pl.cdiv(w + 2 * _R, 128) * 128
    if not vmem.min_window_fits("thin", wp):
        # even the minimal 8-row block exceeds the VMEM budget
        # (>=2800 px wide): width chunks with real halo columns; the
        # NMS samples reach <= 3 px (+-2 along the direction with
        # bicubic +-1), so an 8-col halo is exact
        cw, halo = 2048, 8
        outs = []
        for cx in range(0, w, cw):
            lo, hi = max(0, cx - halo), min(w, cx + cw + halo)
            part = _thin_pallas(edge_img[:, lo:hi], vec[:, lo:hi],
                                mode, slack, bh)
            outs.append(part[:, cx - lo:cx - lo + min(cw, w - cx)])
        return jnp.concatenate(outs, axis=1)
    # the per-k bicubic weight maps dominate the scoped stack
    bh = vmem.pick_block_rows("thin", bh, wp, h=h)
    p = pad2d(edge_img, _R, "mirror")                     # (h+8, w+8)
    # slice b holds y offset b-3: p[(b-3)+_R + y] = edge[y + b-3]
    em8 = jnp.stack([p[b + 1:b + 1 + h, :] for b in range(8)])
    em8 = jnp.pad(em8, ((0, 0), (0, 0), (0, wp - w - 2 * _R)))
    vx = jnp.pad(vec[..., 0], ((0, 0), (_R, wp - w - _R)))
    vy = jnp.pad(vec[..., 1], ((0, 0), (_R, wp - w - _R)))

    nb = pl.cdiv(h, bh)
    spec2 = pl.BlockSpec((bh, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((8, bh, wp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    interpret = jax.default_backend() not in ("tpu",)
    out = pl.pallas_call(
        functools.partial(_thin_kernel, bh=bh, mode=mode, slack=slack),
        out_shape=jax.ShapeDtypeStruct((h, wp), edge_img.dtype),
        grid=(nb,),
        in_specs=[spec3, spec2, spec2],
        out_specs=spec2,
        interpret=interpret,
        compiler_params=vmem.compiler_params(),
    )(em8, vx, vy)
    return out[:, _R:_R + w]


def thinthres_pallas(edge_img, vec, bh: int = 16):
    """Drop-in replacement for thin.thinthres (ulp-equal)."""
    return _thin_pallas(edge_img, vec, "thres", 0.0, bh)


def thincubic_pallas(edge_img, vec, slack: float = 0.99, bh: int = 16):
    """Drop-in replacement for thin.thincubic (ulp-equal)."""
    return _thin_pallas(edge_img, vec, "cubic", slack, bh)
