"""Non-max-suppression edge thinning with bicubic resampling.

The reference samples the edge magnitude at +-1 and +-2 steps along the local
unit gradient direction with Catmull-Rom bicubic interpolation and keeps a
pixel only if it is a local max along that direction (thinthres_f_f_f2,
oclimgutil.cl:456-471; bicubic, oclimgutil.cl:65-94).

On a GPU that is 4 arbitrary 16-tap gathers per pixel.  TPU gathers over a
1M-pixel image are slow, so this module uses a *gather-free* formulation:
because |direction| = 1, every sample lands within +-2 px of the center, so
all 16 bicubic taps of all samples live in a static 8x8 neighborhood
(offsets -3..+4).  The bicubic value is a linear combination of those taps,
so we evaluate

    sample = sum_{a,b in -3..4}  wx_a * wy_b * img[y+b, x+a]

where the per-pixel weights wx_a place the 4 Catmull-Rom weights at the
data-dependent integer offset.  64 statically shifted multiply-adds per
sample, pure VPU, fully fused — zero gathers.

Fidelity notes (matching the reference bit-for-bit in structure):
  * the reference computes ix = (int)x, i.e. truncation toward zero, so the
    fractional coordinate can be negative near the left/top borders; we use
    trunc() likewise and let the Catmull-Rom polynomial extrapolate.
  * borders use mirror (reflect-101) just like bicubic()'s mirror() taps.
"""

from __future__ import annotations

import jax.numpy as jnp

from rectdetect_tpu.ops.shifts import pad2d, shifted

_R = 4  # padded radius: tap offsets span [-3, +4]


def _catmull_rom_weights(f):
    """The 4 Catmull-Rom weights at fractional position f (can be <0)."""
    f2 = f * f
    f3 = f2 * f
    w0 = -0.5 * f3 + f2 - 0.5 * f
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
    w3 = 0.5 * f3 - 0.5 * f2
    return (w0, w1, w2, w3)


def _axis_weights(delta, coord):
    """Per-pixel weights w_a for tap offsets a in -3..4 along one axis.

    delta: per-pixel sample offset in (-2, 2]; coord: the integer pixel
    coordinate along this axis.  The reference computes ix = (int)(coord +
    delta) — truncation of the *absolute* position toward zero — so the
    integer part of the offset is fd = trunc(coord+delta) - coord, which is
    floor(delta) when coord+delta >= 0 and ceil(delta) below zero.  Tap a
    gets Catmull-Rom weight w_i(f) with f = delta - fd, i = a - fd + 1.
    """
    pos = coord + delta
    fd = jnp.where(pos >= 0, jnp.floor(delta), jnp.ceil(delta))
    f = delta - fd
    fdi = fd.astype(jnp.int32)
    cr = _catmull_rom_weights(f)
    ws = []
    for a in range(-3, 5):
        i = a - fdi + 1  # which Catmull-Rom weight lands on tap a
        w = jnp.zeros_like(delta)
        for k in range(4):
            w = jnp.where(i == k, cr[k], w)
        ws.append(w)
    return ws


def bicubic_sample_along(img, vx, vy, k: float):
    """Bicubic sample of img at (x + k*vx, y + k*vy) for every pixel.

    img, vx, vy: (H, W) float32; |(vx,vy)| <= 1; |k| <= 2.
    """
    h, w = img.shape[-2], img.shape[-1]
    p = pad2d(img, _R, "mirror")
    xs = jnp.arange(w, dtype=img.dtype)[None, :]
    ys = jnp.arange(h, dtype=img.dtype)[:, None]
    wxs = _axis_weights(k * vx, xs)
    wys = _axis_weights(k * vy, ys)
    out = jnp.zeros_like(img)
    for b in range(-3, 5):
        wy = wys[b + 3]
        row = jnp.zeros_like(img)
        for a in range(-3, 5):
            row = row + wxs[a + 3] * shifted(p, _R, b, a, h, w)
        out = out + wy * row
    return out


def _samples(edge_img, vec):
    vx = vec[..., 0]
    vy = vec[..., 1]
    am2 = bicubic_sample_along(edge_img, vx, vy, -2.0)
    am1 = bicubic_sample_along(edge_img, vx, vy, -1.0)
    a0 = edge_img
    ap1 = bicubic_sample_along(edge_img, vx, vy, 1.0)
    ap2 = bicubic_sample_along(edge_img, vx, vy, 2.0)
    return am2, am1, a0, ap1, ap2


def thinthres(edge_img, vec):
    """NMS thinning (thinthres_f_f_f2, oclimgutil.cl:456-471).

    Keep pixel if am1 <= a0 >= ap1; output is the 5-sample sum (a smoothed
    edge strength along the ridge), else 0.

    On TPU dispatches to the blocked Pallas kernel (ops/pallas_thin.py):
    the 256 pad/slice stencil reads become in-VMEM lane rolls.
    """
    import jax

    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_thin import thinthres_pallas
        return thinthres_pallas(edge_img, vec)
    am2, am1, a0, ap1, ap2 = _samples(edge_img, vec)
    keep = (am1 <= a0) & (a0 >= ap1)
    return jnp.where(keep, am2 + am1 + a0 + ap1 + ap2, 0.0)


def thincubic(edge_img, vec, slack: float = 0.99):
    """Slack-variant thinning (thincubic_float_float, oclimgutil.cl:473-491)."""
    import jax

    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_thin import thincubic_pallas
        return thincubic_pallas(edge_img, vec, slack)
    am2, am1, a0, ap1, ap2 = _samples(edge_img, vec)
    keep = ((am2 * slack <= a0) & (am1 * slack <= a0) &
            (a0 >= ap1 * slack) & (a0 >= ap2 * slack))
    return jnp.where(keep, am2 + am1 + a0 + ap1 + ap2, 0.0)
