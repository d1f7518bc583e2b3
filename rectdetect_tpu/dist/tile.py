"""Width-tile spatial parallelism: halo exchange + cross-tile labeling.

This is the build's "sequence parallelism" analog (SURVEY.md §5): the
long-range dependency machinery (stencils, label propagation over
arbitrarily long pixel chains) must cross tile seams.  Mechanisms:

  * stencil stages: exchange `halo` boundary columns with ICI neighbors
    (`lax.ppermute`), compute on the widened tile, crop — bitwise equal
    to the single-chip stencil because every front-end op has finite
    static support (blur taps r<=3, edgevec 5x5, edge 3x3, thin 8x8,
    total well under the default halo).
  * connected-component labeling: each tile labels locally (the fast
    single-chip pointer-jumping CCL over LOCAL indices), then keeps one
    GLOBAL label per local root in a value table.  Seam rounds exchange
    boundary columns and scatter-min into the root table, so a minimum
    crossing a seam floods the entire local component in one gather —
    O(#seam crossings of a component) rounds, not O(path length).

All functions here run INSIDE shard_map with axis_name "tile".
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from rectdetect_tpu.core import color
from rectdetect_tpu.ops import blur, gradient, thin
from rectdetect_tpu.ops.ccl import label_components
from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG


def halo_exchange_w(x, halo: int, axis_name: str = "tile"):
    """Widen a width-tile with `halo` columns from each ICI neighbor.

    x: (..., H, W_local).  Edge tiles mirror-pad (reflect-101), interior
    seams receive true neighbor columns, so the composition equals the
    full-frame mirror-padded stencil."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    left_src = [(i, (i + 1) % n) for i in range(n)]   # data flows right
    right_src = [((i + 1) % n, i) for i in range(n)]  # data flows left
    from_left = lax.ppermute(x[..., -halo:], axis_name, left_src)
    from_right = lax.ppermute(x[..., :halo], axis_name, right_src)
    # reflect-101 at the true frame borders
    lpad = jnp.flip(x[..., 1:halo + 1], axis=-1)
    rpad = jnp.flip(x[..., -halo - 1:-1], axis=-1)
    left = jnp.where(idx == 0, lpad, from_left)
    right = jnp.where(idx == n - 1, rpad, from_right)
    return jnp.concatenate([left, x, right], axis=-1)


def edge_frontend_tiled(bgr_tile, halo: int = 16,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        axis_name: str = "tile"):
    """The edge front-end on a width-tile: returns (edge_thin, edge_bin)
    for the local tile, equal to the single-chip result's tile."""
    lab = color.bgr_to_labf(bgr_tile)
    labq = color.quantize_labf(lab)
    wide = halo_exchange_w(labq.transpose(2, 0, 1), halo, axis_name)
    labb = jnp.stack([blur.gaussian_blur(wide[c], cfg.blur_radius)
                      for c in range(3)], axis=-1)
    vec = gradient.edgevec(labb[..., 0])
    em = gradient.edge_lab(color.quantize_labf(labb))
    et = thin.thinthres(em, vec)
    et = et[..., halo:-halo]
    return et, (et > 0).astype(jnp.int32)


def rect_step_tiled(frame_tile, tan_aov, halo: int = 16,
                    cfg: PipelineConfig = DEFAULT_CONFIG,
                    axis_name: str = "tile"):
    """Full rect detection for one frame whose width is sharded over the
    tile axis (call inside shard_map).

    The stencil-heavy front-end runs tiled with ICI halo exchange; the
    front-end products are all_gather'd and the label/geometry tail runs
    replicated per tile (it is small relative to the stencils, and its
    pointer-chasing does not shard cleanly — cross-tile CCL for the tail
    is available separately as ccl_tiled).  Returns a full-frame
    RectResult, identical on every tile rank."""
    from jax import lax as _lax
    from rectdetect_tpu.pipeline.rect import rect_tail

    et, eb = edge_frontend_tiled(frame_tile, halo, cfg, axis_name)
    packed_local = color.pack_lab(color.bgr_to_labf(frame_tile))
    packed = _lax.all_gather(packed_local, axis_name, axis=1, tiled=True)
    etf = _lax.all_gather(et, axis_name, axis=1, tiled=True)
    ebf = _lax.all_gather(eb, axis_name, axis=1, tiled=True)
    return rect_tail(packed, etf, ebf, tan_aov, cfg)


def ccl_tiled(pix_tile, bgc: int, n_seam: int,
              cfg: PipelineConfig = DEFAULT_CONFIG,
              axis_name: str = "tile"):
    """8-connected equal-value CCL across width tiles.

    pix_tile: (H, Wl).  Returns GLOBAL flat-index labels (y * W +
    x_global), -1 background — identical to the single-chip
    label_components on the stitched frame once converged.
    """
    h, wl = pix_tile.shape
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    w = wl * n
    gsent = jnp.int32(h * w)

    # 1. local CCL over local indices (fast pointer-jumping form)
    local = label_components(pix_tile, bgc, cfg.ccl_passes, cfg.ccl_jumps)
    lflat = jnp.where(local >= 0, local, h * wl).reshape(-1)  # sentinel slot

    # 2. value table: global label per local root
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xg = jnp.arange(wl, dtype=jnp.int32)[None, :] + idx * wl
    gidx = (yy * w + xg).reshape(-1)
    value = jnp.full((h * wl + 1,), gsent, jnp.int32)
    value = value.at[lflat].min(jnp.where(lflat < h * wl, gidx, gsent),
                                mode="drop")

    left_src = [(i, (i + 1) % n) for i in range(n)]
    right_src = [((i + 1) % n, i) for i in range(n)]
    fg = (pix_tile != bgc)
    lcol_root = lflat.reshape(h, wl)[:, 0]
    rcol_root = lflat.reshape(h, wl)[:, -1]

    def seam_round(_, value):
        glabel = value[lflat].reshape(h, wl)
        lcol = jnp.stack([glabel[:, -1],
                          pix_tile[:, -1].astype(jnp.int32)])
        rcol = jnp.stack([glabel[:, 0],
                          pix_tile[:, 0].astype(jnp.int32)])
        from_left = lax.ppermute(lcol, axis_name, left_src)
        from_right = lax.ppermute(rcol, axis_name, right_src)

        def seam_cand(nb, own_pix, own_glb, active):
            best = own_glb
            for dy in (-1, 0, 1):
                nl = jnp.roll(nb[0], dy)
                np_ = jnp.roll(nb[1], dy)
                ok = (np_ == own_pix)
                if dy == 1:
                    ok = ok.at[0].set(False)
                if dy == -1:
                    ok = ok.at[-1].set(False)
                best = jnp.minimum(best, jnp.where(ok & active, nl, gsent))
            return best

        lbest = seam_cand(from_left, pix_tile[:, 0].astype(jnp.int32),
                          glabel[:, 0], (idx > 0) & fg[:, 0])
        rbest = seam_cand(from_right, pix_tile[:, -1].astype(jnp.int32),
                          glabel[:, -1], (idx < n - 1) & fg[:, -1])
        value = value.at[lcol_root].min(lbest, mode="drop")
        value = value.at[rcol_root].min(rbest, mode="drop")
        return value

    value = lax.fori_loop(0, n_seam, seam_round, value)
    glabel = value[lflat].reshape(h, wl)
    return jnp.where(fg, glabel, -1)
