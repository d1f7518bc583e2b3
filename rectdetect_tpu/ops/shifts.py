"""Static-shift stencil helpers.

Every 2D stencil in the pipeline (gradients, junction counting, despeckle,
boundary marking, ...) is expressed as a sum/select of *statically shifted* copies
of the image.  On TPU this is the fastest possible formulation: each shift is
a slice of a padded array, and XLA fuses the whole stencil into one VPU pass
with no gathers and no dynamic indexing.

The reference uses two boundary conventions:
  * mirror(): reflect-101 (clamp(x, -x, 2w-2-x), oclimgutil.cl:41-45)
  * explicit border masks (kernels that skip x<=0 etc.)
"""

from __future__ import annotations

import jax.numpy as jnp

_PAD_MODES = {"mirror": "reflect", "edge": "edge", "zero": "constant"}


def pad2d(img, r: int, mode: str = "mirror", constant=0):
    """Pad the last two dims by r with the given boundary mode."""
    kw = {}
    np_mode = _PAD_MODES[mode]
    if np_mode == "constant":
        kw["constant_values"] = constant
    pad = [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)]
    return jnp.pad(img, pad, mode=np_mode, **kw)


def shifted(padded, r: int, dy: int, dx: int, h: int, w: int):
    """View of pad2d(img, r) such that out[y,x] = img_padded[y+dy, x+dx].

    I.e. the value of the *neighbor at offset (dy,dx)* under the padding's
    boundary rule.  dy/dx in [-r, r].
    """
    return padded[..., r + dy:r + dy + h, r + dx:r + dx + w]


def shift2d(img, dy: int, dx: int, mode: str = "mirror", constant=0):
    """out[y,x] = img[y+dy, x+dx] with boundary handling (one-shot form)."""
    r = max(abs(dy), abs(dx), 1)
    h, w = img.shape[-2], img.shape[-1]
    return shifted(pad2d(img, r, mode, constant), r, dy, dx, h, w)


def border_mask(h: int, w: int, margin: int, dtype=jnp.bool_):
    """True for pixels at least `margin` away from every image border.

    Mirrors the reference's `if (x <= m-1 || ... ) return;` guards.
    """
    y = jnp.arange(h)[:, None]
    x = jnp.arange(w)[None, :]
    m = ((y >= margin) & (y < h - margin) & (x >= margin) & (x < w - margin))
    return m.astype(dtype) if dtype != jnp.bool_ else m


# 8-neighborhood order used throughout the reference (oclpolyline.cl:63-64).
NEIGH8 = ((0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1))
# Alias emphasizing that getnp's first/second-neighbor semantics depend on
# exactly this scan order (oclpolyline.cl:169-191).
NEIGH8_REF = NEIGH8
# 4-neighborhood (up, left, right, down) as used by labelMergeMain.
NEIGH4 = ((-1, 0), (0, -1), (0, 1), (1, 0))
