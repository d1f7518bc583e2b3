"""Pallas TPU kernel fusing the blurred-Lab gradient stage.

Computes in one VMEM pass what the XLA formulation does in three
HBM-materialized steps (pipeline/frontend.py:36-39):

    vec = edgevec(labb[..., 0])          # 5x5 bank, ops/gradient.py
    em  = edge_lab(quantize_labf(labb))  # 3x3 cross-difference, 3 channels

y taps (offsets -2..+2) come from globally pre-shifted copies built from
one reflect-101 pad (same mirror semantics as ops/shifts.pad2d, i.e. the
reference's mirror(), oclimgutil.cl:41-45); x taps are lane rolls on a
4-column mirror-padded row.  Loop order and expression shapes match
ops/gradient.py exactly; residual differences are FMA-contraction ulp
(tests/test_pallas_grad.py uses the tolerance contract).

Reference: edgevec_f oclimgutil.cl:395-420 (5x5 bank oclimgutil.cl:346-352),
edge_plab oclimgutil.cl:422-437, pack/unpack lattice oclimgutil.cl:36-39.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rectdetect_tpu.ops.gradient import V5C, _SQRT_HALF, _rsqrt
from rectdetect_tpu.ops.shifts import pad2d
from rectdetect_tpu.ops import vmem

_R = 2  # pad radius: edgevec reaches +-2, edge +-1


def _roll(x, dx: int):
    return x if dx == 0 else jnp.roll(x, -dx, axis=1)


def _quant(x, scale: float, hi: float):
    q = jnp.clip(jnp.floor(x * scale), 0.0, hi)
    return (q + 0.5) / scale


_QPARAMS = ((4096.0, 4095.0), (1024.0, 1023.0), (1024.0, 1023.0))


def _grad_kernel(lab5_ref, em_ref, ux_ref, uy_ref):
    lab5 = lab5_ref[:]                  # (5, 3, bh, wp): dy -2..2, channel
    bhh, wp = lab5.shape[2:]
    ftype = lab5.dtype

    # ---- edgevec on the L channel (ops/gradient.py:_grad5 loop order) ---
    vx = jnp.zeros((bhh, wp), ftype)
    vy = jnp.zeros((bhh, wp), ftype)
    for yy in range(-2, 3):
        L = lab5[yy + 2, 0]
        for xx in range(-2, 3):
            cx = V5C[yy + 2][xx + 2]
            cy = V5C[xx + 2][yy + 2]
            if cx == 0.0 and cy == 0.0:
                continue
            s = _roll(L, xx)
            if cx != 0.0:
                vx = vx + cx * s
            if cy != 0.0:
                vy = vy + cy * s
    ivlen = vx * vx + vy * vy
    rs = _rsqrt(ivlen)
    ux_ref[:] = jnp.where(ivlen > 1e-10, vx * rs, _SQRT_HALF)
    uy_ref[:] = jnp.where(ivlen > 1e-10, vy * rs, _SQRT_HALF)

    # ---- edge_lab on the quantized planes (ops/gradient.py:_edge_single)
    total = jnp.zeros((bhh, wp), ftype)
    for c in range(3):
        scale, hi = _QPARAMS[c]
        q = [_quant(lab5[dy + 2, c], scale, hi) for dy in (-1, 0, 1)]

        def n(dy, dx):
            return _roll(q[dy + 1], dx)

        t0 = n(-1, 0) + n(0, -1) - n(1, 0) - n(0, 1)
        s0 = (n(-1, -1) - n(1, 1)) * t0
        t1 = n(-1, 0) - n(0, -1) + n(0, 1) - n(1, 0)
        s1 = (n(-1, 1) - n(1, -1)) * t1
        total = total + jnp.maximum(0.0, s0 + s1)
    em_ref[:] = jnp.where(total > 0, jnp.sqrt(total), 0.0)


@functools.partial(jax.jit, static_argnames=("bh",))
def edge_front_pallas(labb, bh: int = 32):
    """labb: blurred Lab planes (H, W, 3) f32 -> (em (H,W), vec (H,W,2)).

    Drop-in fusion of edgevec(labb[...,0]) and
    edge_lab(quantize_labf(labb))."""
    h, w, _ = labb.shape
    wp = pl.cdiv(w + 2 * _R, 128) * 128
    bh = vmem.pick_block_rows("edge_front", bh, wp, h=h)
    p = pad2d(jnp.moveaxis(labb, -1, 0), _R, "mirror")    # (3, h+4, w+4)
    lab5 = jnp.stack([p[:, b:b + h, :] for b in range(5)])  # (5,3,h,w+4)
    lab5 = jnp.pad(lab5, ((0, 0), (0, 0), (0, 0), (0, wp - w - 2 * _R)))

    nb = pl.cdiv(h, bh)
    spec4 = pl.BlockSpec((5, 3, bh, wp), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((bh, wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    interpret = jax.default_backend() not in ("tpu",)
    em, ux, uy = pl.pallas_call(
        _grad_kernel,
        out_shape=(jax.ShapeDtypeStruct((h, wp), labb.dtype),
                   jax.ShapeDtypeStruct((h, wp), labb.dtype),
                   jax.ShapeDtypeStruct((h, wp), labb.dtype)),
        grid=(nb,),
        in_specs=[spec4],
        out_specs=(spec2, spec2, spec2),
        interpret=interpret,
        compiler_params=vmem.compiler_params(),
    )(lab5)
    sl = slice(_R, _R + w)
    return em[:, sl], jnp.stack([ux[:, sl], uy[:, sl]], axis=-1)
