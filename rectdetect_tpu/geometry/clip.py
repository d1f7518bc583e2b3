"""Branchless batched Cohen-Sutherland line clipping.

clipLineWithRect (oclrect.c:758-802) loops until accept/reject; each
endpoint can be clipped against at most all 4 box sides, so 4 fixed
iterations of the update step reach the fixpoint.  NaN = rejected, like
the reference's NAN sentinel return.
"""

from __future__ import annotations

import jax.numpy as jnp

_LEFT, _RIGHT, _BOTTOM, _TOP = 1, 2, 4, 8


def _outcode(x, y, box):
    code = jnp.where(x < box[..., 0], _LEFT, 0)
    code |= jnp.where(x > box[..., 2], _RIGHT, 0)
    code |= jnp.where(y < box[..., 1], _BOTTOM, 0)
    code |= jnp.where(y > box[..., 3], _TOP, 0)
    return code


def clip_segments(segs, boxes):
    """segs: (...,4) [x0,y0,x1,y1]; boxes: (...,4) [xmin,ymin,xmax,ymax].
    Returns (...,4) clipped coords, NaN-filled where rejected."""
    x0, y0, x1, y1 = (segs[..., 0], segs[..., 1], segs[..., 2], segs[..., 3])
    xmin, ymin, xmax, ymax = (boxes[..., 0], boxes[..., 1],
                              boxes[..., 2], boxes[..., 3])

    c0 = _outcode(x0, y0, boxes)
    c1 = _outcode(x1, y1, boxes)
    accept = (c0 | c1) == 0
    reject = (c0 & c1) != 0

    for _ in range(4):
        active = ~accept & ~reject
        out = jnp.where(c0 != 0, c0, c1)
        dx = x1 - x0
        dy = y1 - y0
        dy_safe = jnp.where(dy == 0, 1.0, dy)
        dx_safe = jnp.where(dx == 0, 1.0, dx)
        # priority: TOP, BOTTOM, RIGHT, LEFT (oclrect.c:773-785)
        is_top = (out & _TOP) != 0
        is_bot = ~is_top & ((out & _BOTTOM) != 0)
        is_right = ~is_top & ~is_bot & ((out & _RIGHT) != 0)
        nx = jnp.where(is_top, x0 + dx * (ymax - y0) / dy_safe,
             jnp.where(is_bot, x0 + dx * (ymin - y0) / dy_safe,
             jnp.where(is_right, xmax, xmin)))
        ny = jnp.where(is_top, ymax,
             jnp.where(is_bot, ymin,
             jnp.where(is_right, y0 + dy * (xmax - x0) / dx_safe,
                       y0 + dy * (xmin - x0) / dx_safe)))
        upd0 = active & (out == c0)
        upd1 = active & (out != c0)
        x0 = jnp.where(upd0, nx, x0)
        y0 = jnp.where(upd0, ny, y0)
        x1 = jnp.where(upd1, nx, x1)
        y1 = jnp.where(upd1, ny, y1)
        c0 = _outcode(x0, y0, boxes)
        c1 = _outcode(x1, y1, boxes)
        accept = accept | ((c0 | c1) == 0)
        reject = reject | (~accept & ((c0 & c1) != 0))

    out = jnp.stack([x0, y0, x1, y1], axis=-1)
    return jnp.where((accept & ~reject)[..., None], out, jnp.nan)
