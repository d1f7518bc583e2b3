"""Pallas TPU kernel for NMS edge thinning (thinthres / thincubic).

Same exact-Horner formulation as ops/thin.py (select the 4 Catmull-Rom taps
per axis from static shifts, then run the reference's bicubicSub sequence,
oclimgutil.cl:65-74), with the stencil reads turned into in-VMEM lane rolls:

  * y taps (offsets -3..+4) come from 8 globally pre-shifted copies of the
    edge image, built once in XLA from the SAME reflect-101 padding as the
    reference (mirror(), oclimgutil.cl:41-45) — so boundary semantics are
    bit-identical to ops/thin.py;
  * x taps are jnp.roll within the block; the image is pre-padded by 4
    mirror columns so rolled wrap-around values are never read by a valid
    output column;
  * the 64 tap rolls are shared by all four sample offsets k in
    {-2,-1,1,2} via an explicit hoist.

The per-pixel select + Horner sequence matches ops/thin.py op for op;
residual differences are FMA-contraction ulp on the Mosaic side, so tests
keep the tolerance contract (tests/test_pallas_thin.py) while the XLA path
is bit-exact vs the golden oracle (tests/test_edge_ops.py).

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
from rectdetect_tpu.ops.thin import _bicubic_sub, _int_frac

_R = 4          # tap offsets span [-3, +4] (ops/thin.py)
_KS = (-2.0, -1.0, 1.0, 2.0)


def _thin_kernel(em8_ref, vx_ref, vy_ref, out_ref, *, bh: int, mode: str,
                 slack: float):
    blk = pl.program_id(0)
    em8 = em8_ref[:]                    # (8, bh, wp): y-offsets -3..+4
    vx = vx_ref[:]
    vy = vy_ref[:]
    bhh, wp = vx.shape

    # true pixel coordinates (the reference truncates the f32-rounded
    # ABSOLUTE position, ops/thin.py:_int_frac)
    ixc = jax.lax.broadcasted_iota(jnp.int32, (bhh, wp), 1) - _R
    iyc = jax.lax.broadcasted_iota(jnp.int32, (bhh, wp), 0) + blk * bh
    xcoord = ixc.astype(vx.dtype)
    ycoord = iyc.astype(vx.dtype)

    # all 64 (y offset b-3, x offset o) taps, shared across the 4 samples
    taps = []
    for b in range(8):
        emb = em8[b]
        # Mosaic rejects roll-by-0 (zero-size slice)
        taps.append([emb if o == 0 else jnp.roll(emb, -o, axis=1)
                     for o in range(-3, 5)])

    acc = []
    for k in _KS:
        kr = int(abs(k))
        fdx, fx = _int_frac(k * vx, xcoord, ixc)
        fdy, fy = _int_frac(k * vy, ycoord, iyc)
        rows = []
        for b in range(-kr - 1, kr + 3):
            trow = taps[b + 3]
            t = []
            for i in range(4):
                a = trow[(-kr + i - 1) + 3]            # fd = -kr
                for fd in range(-kr + 1, kr + 1):
                    a = jnp.where(fdx == fd, trow[(fd + i - 1) + 3], a)
                t.append(a)
            rows.append(_bicubic_sub(t[0], t[1], t[2], t[3], fx))
        R = []
        for j in range(4):
            r = rows[j]                                # fd = -kr
            for fd in range(-kr + 1, kr + 1):
                r = jnp.where(fdy == fd, rows[fd + j + kr], r)
            R.append(r)
        acc.append(_bicubic_sub(R[0], R[1], R[2], R[3], fy))

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
    # the per-k tap/row maps dominate the scoped stack
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
