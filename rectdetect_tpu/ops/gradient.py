"""Oriented edge gradient (edgevec) and second-derivative edge magnitude.

edgevec: 5x5 oriented-gradient filter bank producing per-pixel *unit* edge
direction vectors (edgevec_f / edgevec_plab, oclimgutil.cl:346-420).  The
x-filter uses the coefficient table below; the y-filter is its transpose.

edge: a 3x3 cross-difference second-derivative operator whose positive part
is summed over channels and square-rooted (edge_plab / edge_f_f,
oclimgutil.cl:422-452).

Both use reflect-101 borders and are pure static stencils -> shifted adds.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

from rectdetect_tpu.ops.shifts import pad2d, shifted


def _rsqrt(x):
    return lax.rsqrt(jnp.maximum(x, 1e-30))

# 5x5 oriented-gradient coefficients (v5c, oclimgutil.cl:346-352).
V5C = (
    (-4.667, -4.083, 0.000, 4.083, 4.667),
    (-10.024, -0.963, 0.000, 0.963, 10.024),
    (-14.120, 3.622, 0.000, -3.622, 14.120),
    (-10.024, -0.963, 0.000, 0.963, 10.024),
    (-4.667, -4.083, 0.000, 4.083, 4.667),
)

_SQRT_HALF = 0.70710678118


def _grad5(img):
    """Raw (vx, vy) responses of the 5x5 filter bank. img: (..., H, W)."""
    h, w = img.shape[-2], img.shape[-1]
    p = pad2d(img, 2, "mirror")
    vx = jnp.zeros_like(img)
    vy = jnp.zeros_like(img)
    for yy in range(-2, 3):
        for xx in range(-2, 3):
            cx = V5C[yy + 2][xx + 2]
            cy = V5C[xx + 2][yy + 2]
            if cx == 0.0 and cy == 0.0:
                continue
            s = shifted(p, 2, yy, xx, h, w)
            if cx != 0.0:
                vx = vx + cx * s
            if cy != 0.0:
                vy = vy + cy * s
    return vx, vy


def edgevec(img):
    """Single-channel edgevec: (H,W) float -> (H,W,2) unit direction vectors.

    Mirrors edgevec_f (oclimgutil.cl:395-420): normalize when |v|^2 > 1e-10,
    else fall back to (sqrt(1/2), sqrt(1/2)).
    """
    vx, vy = _grad5(img)
    ivlen = vx * vx + vy * vy
    rs = _rsqrt(ivlen)
    ux = jnp.where(ivlen > 1e-10, vx * rs, _SQRT_HALF)
    uy = jnp.where(ivlen > 1e-10, vy * rs, _SQRT_HALF)
    return jnp.stack([ux, uy], axis=-1)


def edgevec_lab(labf):
    """3-channel edgevec on Lab planes: (H,W,3) -> (H,W,2) unit vectors.

    Mirrors edgevec_plab (oclimgutil.cl:354-393): pick the channel with
    maximum gradient energy, sign-align it to the L channel when the L
    response is significant, then normalize with the same fallback.
    """
    vxs, vys = [], []
    for c in range(3):
        vx, vy = _grad5(labf[..., c])
        vxs.append(vx)
        vys.append(vy)
    vx3 = jnp.stack(vxs, axis=-1)
    vy3 = jnp.stack(vys, axis=-1)
    e3 = vx3 * vx3 + vy3 * vy3
    e0, e1, e2 = e3[..., 0], e3[..., 1], e3[..., 2]
    # Channel selection with the reference's exact tie-breaking order.
    pick0 = (e0 >= e1) & (e0 >= e2)
    pick1 = (~pick0) & (e1 >= e2)
    vx = jnp.where(pick0, vx3[..., 0], jnp.where(pick1, vx3[..., 1], vx3[..., 2]))
    vy = jnp.where(pick0, vy3[..., 0], jnp.where(pick1, vy3[..., 1], vy3[..., 2]))
    ivlen = jnp.where(pick0, e0, jnp.where(pick1, e1, e2))
    flip = (e0 >= 1e-6) & (vx3[..., 0] * vx + vy3[..., 0] * vy < 0)
    vx = jnp.where(flip, -vx, vx)
    vy = jnp.where(flip, -vy, vy)
    rs = _rsqrt(ivlen)
    ux = jnp.where(ivlen > 1e-10, vx * rs, _SQRT_HALF)
    uy = jnp.where(ivlen > 1e-10, vy * rs, _SQRT_HALF)
    return jnp.stack([ux, uy], axis=-1)


def _edge_single(img):
    """Per-channel cross-difference products (before clamping)."""
    h, w = img.shape[-2], img.shape[-1]
    p = pad2d(img, 1, "mirror")

    def n(dy, dx):
        return shifted(p, 1, dy, dx, h, w)

    t0 = n(-1, 0) + n(0, -1) - n(1, 0) - n(0, 1)
    s0 = (n(-1, -1) - n(1, 1)) * t0
    t1 = n(-1, 0) - n(0, -1) + n(0, 1) - n(1, 0)
    s1 = (n(-1, 1) - n(1, -1)) * t1
    return s0, s1


def edge(img):
    """Single-channel edge magnitude (edge_f_f, oclimgutil.cl:439-452)."""
    s0, s1 = _edge_single(img)
    return jnp.sqrt(jnp.maximum(0.0, s0 + s1))


def edge_lab(labf):
    """3-channel edge magnitude (edge_plab, oclimgutil.cl:422-437).

    Each channel's (s0+s1) is clamped to >=0 *per channel* before summing.
    """
    total = None
    for c in range(3):
        s0, s1 = _edge_single(labf[..., c])
        v = jnp.maximum(0.0, s0 + s1)
        total = v if total is None else total + v
    return jnp.where(total > 0, jnp.sqrt(total), 0.0)
