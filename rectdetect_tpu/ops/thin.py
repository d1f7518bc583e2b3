"""Non-max-suppression edge thinning with bicubic resampling.

The reference samples the edge magnitude at +-1 and +-2 steps along the local
unit gradient direction with Catmull-Rom bicubic interpolation and keeps a
pixel only if it is a local max along that direction (thinthres_f_f_f2,
oclimgutil.cl:456-471; bicubic, oclimgutil.cl:65-94).

On a GPU that is 4 arbitrary 16-tap gathers per pixel.  TPU gathers over a
1M-pixel image are slow, so this module uses a *gather-free* formulation:
because |direction| = 1, every sample lands within +-2 px of the center, so
all 16 bicubic taps live in a static 8x8 neighborhood (offsets -3..+4).
Each of the 4 taps along an axis is SELECTED per pixel from the statically
shifted copies (a 3- or 5-way jnp.where over the per-pixel integer offset),
then combined with the reference's exact Horner evaluation (bicubicSub,
oclimgutil.cl:65-74):

    v = p1 - p2;  w = p3 - p0
    u = v*3 + w;  u = u*x + (-4*v + (p0 - p1 - w))
    u = u*x + (p2 - p0);  u = u*x*0.5 + p1

Evaluating the SAME f32 sequence as the reference (rather than an expanded
weights-times-taps dot product) matters for parity: on a flat plateau
bicubicSub returns p1 *exactly*, so the NMS tie `am1 <= a0` keeps ridge
pixels; a weighted-sum formulation rounds plateaus by +-1 ulp and
systematically breaks ridges (measured as the round-2 A/B under-detection
asymmetry, docs/STATUS.md).

Fidelity notes (matching the reference bit-for-bit in structure):
  * the reference computes the sample position as float pos = x + k*vx and
    ix = (int)pos — truncation toward zero of the f32-ROUNDED absolute
    position; the fraction is pos - ix.  We reproduce exactly that
    (including the coordinate-magnitude-dependent rounding of pos), so the
    fraction can be negative near the left/top borders and the Horner
    polynomial extrapolates, as in the reference.
  * borders use mirror (reflect-101) just like bicubic()'s mirror() taps.
"""

from __future__ import annotations

import jax.numpy as jnp

from rectdetect_tpu.ops.shifts import pad2d, shifted

_R = 4  # padded radius: tap offsets span [-3, +4]


def _bicubic_sub(p0, p1, p2, p3, x):
    """bicubicSub (oclimgutil.cl:65-74), exact op order."""
    v = p1 - p2
    w = p3 - p0
    u = v * 3.0 + w
    u = u * x + (-4.0 * v + (p0 - p1 - w))
    u = u * x + (p2 - p0)
    u = u * x * 0.5 + p1
    return u


def _int_frac(delta, coord, icoord):
    """Reference position split: pos = coord + delta in f32, ix = trunc(pos).

    Returns (fd, f): fd = ix - coord as int32 (the integer tap offset) and
    f = pos - ix (the Horner fraction, possibly negative below zero).
    """
    pos = coord + delta
    ip = jnp.where(pos >= 0, jnp.floor(pos), jnp.ceil(pos))  # trunc, (int)pos
    return ip.astype(jnp.int32) - icoord, pos - ip


def bicubic_sample_along(img, vx, vy, k: float):
    """Bicubic sample of img at (x + k*vx, y + k*vy) for every pixel.

    img, vx, vy: (H, W) float32; |(vx,vy)| <= 1; k in {-2,-1,1,2}.
    Bit-identical to the reference's bicubic() scalar sequence.
    """
    h, w = img.shape[-2], img.shape[-1]
    kr = max(1, min(2, int(abs(k))))
    p = pad2d(img, _R, "mirror")
    xs = jnp.arange(w, dtype=img.dtype)[None, :]
    ys = jnp.arange(h, dtype=img.dtype)[:, None]
    ixs = jnp.arange(w, dtype=jnp.int32)[None, :]
    iys = jnp.arange(h, dtype=jnp.int32)[:, None]
    fdx, fx = _int_frac(k * vx, xs, ixs)
    fdy, fy = _int_frac(k * vy, ys, iys)

    # x-stage: Horner over the 4 selected taps, for every candidate row b.
    # fd ranges over [-kr, kr]; tap i sits at offset fd + i - 1.
    offs = list(range(-kr - 1, kr + 3))
    rows = []
    for b in offs:
        taps = [shifted(p, _R, b, o, h, w) for o in offs]
        t = []
        for i in range(4):
            acc = taps[i]                      # fd = -kr
            for fd in range(-kr + 1, kr + 1):
                acc = jnp.where(fdx == fd, taps[fd + i + kr], acc)
            t.append(acc)
        rows.append(_bicubic_sub(t[0], t[1], t[2], t[3], fx))
    # y-stage: select the 4 rows at fdy + j - 1, Horner in y.
    R = []
    for j in range(4):
        acc = rows[j]                          # fd = -kr
        for fd in range(-kr + 1, kr + 1):
            acc = jnp.where(fdy == fd, rows[fd + j + kr], acc)
        R.append(acc)
    return _bicubic_sub(R[0], R[1], R[2], R[3], fy)


def _samples(edge_img, vec):
    vx = vec[..., 0]
    vy = vec[..., 1]
    am2 = bicubic_sample_along(edge_img, vx, vy, -2.0)
    am1 = bicubic_sample_along(edge_img, vx, vy, -1.0)
    a0 = edge_img
    ap1 = bicubic_sample_along(edge_img, vx, vy, 1.0)
    ap2 = bicubic_sample_along(edge_img, vx, vy, 2.0)
    return am2, am1, a0, ap1, ap2


def thinthres(edge_img, vec, bh: int = 16):
    """NMS thinning (thinthres_f_f_f2, oclimgutil.cl:456-471).

    Keep pixel if am1 <= a0 >= ap1; output is the 5-sample sum (a smoothed
    edge strength along the ridge), else 0.

    On TPU dispatches to the blocked Pallas kernel (ops/pallas_thin.py):
    the pad/slice stencil reads become in-VMEM lane rolls.  bh: Pallas
    block rows (cfg.thin_bh, autotuned).
    """
    import jax

    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_thin import thinthres_pallas
        return thinthres_pallas(edge_img, vec, bh=bh)
    am2, am1, a0, ap1, ap2 = _samples(edge_img, vec)
    keep = (am1 <= a0) & (a0 >= ap1)
    return jnp.where(keep, am2 + am1 + a0 + ap1 + ap2, 0.0)


def thincubic(edge_img, vec, slack: float = 0.99, bh: int = 16):
    """Slack-variant thinning (thincubic_float_float, oclimgutil.cl:473-491)."""
    import jax

    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_thin import thincubic_pallas
        return thincubic_pallas(edge_img, vec, slack, bh=bh)
    am2, am1, a0, ap1, ap2 = _samples(edge_img, vec)
    keep = ((am2 * slack <= a0) & (am1 * slack <= a0) &
            (a0 >= ap1 * slack) & (a0 >= ap2 * slack))
    return jnp.where(keep, am2 + am1 + a0 + ap1 + ap2, 0.0)
