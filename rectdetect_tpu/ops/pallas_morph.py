"""Fused Pallas morphology: junction -> gap bridge -> stringify x2 (and the
poly-pipeline variant with branch removal) in one VMEM pass.

The XLA formulation (ops/morphology.py) materializes a padded copy per
stencil; the chain is 4-5 dependent 3x3-ish stencils, so each block here
computes the whole chain on a (bh + 2*halo) row window and writes the
middle bh rows — intermediate maps never touch HBM.

Cross-block halos use globally pre-shifted inputs (the blblur trick —
Pallas BlockSpecs cannot overlap): for halo q, block i of `roll(x, q, 0)`
covers rows [i*bh - q, (i+1)*bh - q) and block i of `roll(x, -q, 0)`
covers [i*bh + q, (i+1)*bh + q); concatenating the first with the tail of
the second reconstructs rows [i*bh - q, (i+1)*bh + q).  Wrapped rows are
masked to background by the global row index.

References: simpleJunction oclpolyline.cl:66-87 / oclrect.cl:74-95,
simpleConnect oclpolyline.cl:89-110 / oclrect.cl:97-121, stringify
oclpolyline.cl:112-124, removeBranch oclpolyline.cl:126-147.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rectdetect_tpu.ops.shifts import NEIGH8

_HALO = 8          # chain depth 4-5; 8 keeps the i32 sublane tiling happy
_BLOCK_ROWS = 128


def _morph_kernel(top_ref, bot_ref, out_ref, *, h: int, w: int, bh: int,
                  variant: str):
    blk = pl.program_id(0)
    q = _HALO
    eh = bh + 2 * q
    top = top_ref[:]                       # rows [i*bh - q, (i+1)*bh - q)
    bot = bot_ref[:]                       # rows [i*bh + q, (i+1)*bh + q)
    x = jnp.concatenate([top, bot[bh - 2 * q:]], axis=0)  # (eh, w)

    ly = jax.lax.broadcasted_iota(jnp.int32, (eh, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (eh, w), 1)
    yy = ly + blk * bh - q
    inframe = (yy >= 0) & (yy < h)
    x = jnp.where(inframe, x, 0)

    def sh(arr, dy: int, dx: int):
        """arr[y+dy, x+dx] with zero fill (frame-edge semantics are
        enforced by the interior masks, as in ops/morphology.py)."""
        v = arr
        if dy:
            v = jnp.roll(v, -dy, 0)
        if dx:
            v = jnp.roll(v, -dx, 1)
        ok = (yy + dy >= 0) & (yy + dy < h)
        if dx:
            ok &= (xx + dx >= 0) & (xx + dx < w)
        return jnp.where(ok, v, 0)

    def interior(m: int):
        return ((yy >= m) & (yy < h - m) & (xx >= m) & (xx < w - m))

    # simple_junction (positive_only on already-binary input == != 0)
    nz = (x != 0).astype(jnp.int32)
    cnt = nz * 0
    for dy, dx in NEIGH8:
        cnt = cnt + sh(nz, dy, dx)
    jn = jnp.where((nz != 0) & (cnt > 0), cnt + 1, 0)
    jn = jnp.where(interior(1), jn, 0)

    def n(dy, dx):
        return sh(jn, dy, dx)

    set0 = jn != 0
    if variant == "rect":
        bridge = ((n(0, -1) == 2) & (n(0, 1) != 0))
        bridge |= ((n(0, -1) != 0) & (n(0, 1) == 2))
        bridge |= ((n(-1, 0) == 2) & (n(1, 0) != 0))
        bridge |= ((n(-1, 0) != 0) & (n(1, 0) == 2))
        bridge |= ((n(-1, -1) == 2) & (n(1, 1) == 2))
        bridge |= ((n(-1, 1) == 2) & (n(1, -1) == 2))
        bridge |= ((n(0, 1) == 2) & (n(1, -1) == 2))
        bridge |= ((n(0, -1) == 2) & (n(1, 1) == 2))
        bridge |= ((n(-1, 1) == 2) & (n(1, 0) == 2))
        bridge |= ((n(-1, -1) == 2) & (n(1, 0) == 2))
    else:
        bridge = ((n(0, -2) != 0) & (n(0, -1) == 2) & (n(0, 1) == 2) &
                  (n(0, 2) != 0))
        bridge |= ((n(-2, 0) != 0) & (n(-1, 0) == 2) & (n(1, 0) == 2) &
                   (n(2, 0) != 0))
        bridge |= ((n(-2, -2) != 0) & (n(-1, -1) == 2) & (n(1, 1) == 2) &
                   (n(2, 2) != 0))
        bridge |= ((n(-2, 2) != 0) & (n(-1, 1) == 2) & (n(1, -1) == 2) &
                   (n(2, -2) != 0))
        bridge |= ((n(0, 2) != 0) & (n(0, 1) == 2) & (n(1, -1) == 2) &
                   (n(1, -2) != 0))
        bridge |= ((n(0, -2) != 0) & (n(0, -1) == 2) & (n(1, 1) == 2) &
                   (n(1, 2) != 0))
        bridge |= ((n(-2, 1) != 0) & (n(-1, 1) == 2) & (n(1, 0) == 2) &
                   (n(2, 0) != 0))
        bridge |= ((n(-2, -1) != 0) & (n(-1, -1) == 2) & (n(1, 0) == 2) &
                   (n(2, 0) != 0))
    conn = jnp.where((set0 | bridge) & interior(2), 1, 0)

    def stringify(img, parity: int):
        corner = (((sh(img, -1, 0) != 0) & (sh(img, 0, -1) != 0)) |
                  ((sh(img, -1, 0) != 0) & (sh(img, 0, 1) != 0)) |
                  ((sh(img, 1, 0) != 0) & (sh(img, 0, -1) != 0)) |
                  ((sh(img, 1, 0) != 0) & (sh(img, 0, 1) != 0)))
        on_parity = ((yy + xx) & 1) == parity
        return jnp.where(on_parity & corner & interior(1), 0, img)

    s = stringify(stringify(conn, 0), 1)

    if variant == "poly_branch":
        nzs = (s != 0).astype(jnp.int32)
        cnt2 = nzs * 0
        for dy, dx in NEIGH8:
            cnt2 = cnt2 + sh(nzs, dy, dx)
        s = jnp.where((nzs != 0) & (cnt2 <= 2) & interior(1), 1, 0)

    out_ref[:] = s[q:q + bh].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("variant", "bh"))
def morph_chain_pallas(edge_bin, variant: str = "rect",
                       bh: int = _BLOCK_ROWS):
    """edge_bin (H, W) int32 binary -> strings map, bit-exact vs the
    composed ops/morphology.py chain.

    variant: "rect" = junction+connect_rect+stringify x2 (oclrect.c:265-272),
    "poly" = junction+connect_poly+stringify x2, "poly_branch" = poly plus
    removeBranch (the poly-pipeline prefix, oclpolyline.c stages 1-4).
    """
    h, w = edge_bin.shape
    x = edge_bin.astype(jnp.int32)
    q = _HALO
    bh = min(bh, max(8, (h + 7) // 8 * 8))
    nb = pl.cdiv(h, bh)
    # pad to whole blocks BEFORE rolling: a trailing partial block would
    # otherwise read undefined out-of-bounds rows of the rolled inputs
    # (in-frame ext rows can map there, so the yy mask cannot catch it)
    h2 = nb * bh
    if h2 != h:
        x = jnp.pad(x, ((0, h2 - h), (0, 0)))
    top = jnp.roll(x, q, axis=0)
    bot = jnp.roll(x, -q, axis=0)
    spec = pl.BlockSpec((bh, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    interpret = jax.default_backend() not in ("tpu",)
    out = pl.pallas_call(
        functools.partial(_morph_kernel, h=h, w=w, bh=bh, variant=variant),
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.int32),
        grid=(nb,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(top, bot)
    return out[:h]
