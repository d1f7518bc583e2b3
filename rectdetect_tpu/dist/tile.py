"""Width-tile spatial parallelism: halo exchange + cross-tile labeling.

This is the build's "sequence parallelism" analog (SURVEY.md §5): the
long-range dependency machinery (stencils, label propagation over
arbitrarily long pixel chains) must cross tile seams.  Mechanisms:

  * stencil stages: exchange `halo` boundary columns with ICI neighbors
    (`lax.ppermute`), compute on the widened tile, crop — bitwise equal
    to the single-chip stencil because every op has finite static support
    (blur taps r<=3, edgevec 5x5, edge 3x3, thin 8x8, blblur 5 px/iter)
    and the border-guarded ops take a global-x offset (ops accept
    x0/w_total) so "border" means the TRUE frame border.
  * connected-component labeling: each tile labels locally (the fast
    single-chip pointer-jumping CCL over LOCAL indices), then keeps one
    GLOBAL label per local root in a value table.  Seam rounds exchange
    boundary columns and scatter-min into the root table, so a minimum
    crossing a seam floods the entire local component in one gather —
    O(#seam crossings of a component) rounds, not O(path length).
  * per-component tables (strength sums, size histograms): each tile
    scatter-adds its partial into the global-root-indexed table and the
    tables are `psum`ed over the tile axis (integer adds — exact).
  * the geometry tail (polylines/hypotheses/pose) runs replicated on
    two all_gather'd maps (strong edges + boundary labels), EXCEPT the
    arc walk: its pointer-doubling gathers — the tail's dominant cost —
    shard by slot range, with one all_gather of the walk table per
    doubling (chain._doubling_rows).

All functions here run INSIDE shard_map with axis_name "tile".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from rectdetect_tpu.core import color
from rectdetect_tpu.ops import blur, gradient, morphology, regions, thin
from rectdetect_tpu.ops.ccl import label_components, interior_mask
from rectdetect_tpu.ops.shifts import pad2d, shifted
from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG


def _fetch_from(x, d: int, axis_name: str):
    """The value of x at tile (idx - d) — data flows right by d hops."""
    n = lax.axis_size(axis_name)
    perm = [(i, (i + d) % n) for i in range(n)]
    return lax.ppermute(x, axis_name, perm)


def halo_exchange_w(x, halo: int, axis_name: str = "tile",
                    fill: str = "reflect", fill_value=0):
    """Widen a width-tile with `halo` columns from each ICI neighbor.

    x: (..., H, W_local).  Interior seams receive true neighbor columns
    (multi-hop ppermute when halo > W_local); at the TRUE frame borders
    the pad is reflect-101 (`fill="reflect"`, matches the mirrored
    stencil front-end) or a constant (`fill="const"`, matches the
    zero-padded morphology/blur ops — pick fill_value so beyond-frame
    data is inert for the op)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    wl = x.shape[-1]
    if fill == "reflect":
        if halo > wl:
            raise NotImplementedError("reflect fill needs halo <= tile w")
        left_src = [(i, (i + 1) % n) for i in range(n)]   # data flows right
        right_src = [((i + 1) % n, i) for i in range(n)]  # data flows left
        from_left = lax.ppermute(x[..., -halo:], axis_name, left_src)
        from_right = lax.ppermute(x[..., :halo], axis_name, right_src)
        lpad = jnp.flip(x[..., 1:halo + 1], axis=-1)
        rpad = jnp.flip(x[..., -halo - 1:-1], axis=-1)
        left = jnp.where(idx == 0, lpad, from_left)
        right = jnp.where(idx == n - 1, rpad, from_right)
        return jnp.concatenate([left, x, right], axis=-1)

    # hop d contributes c_d columns; hops past the mesh edge are pure
    # fill (no ppermute issued)
    fillv = jnp.asarray(fill_value, x.dtype)
    hops = []                         # (d, c_d), nearest first
    rem = halo
    d = 1
    while rem > 0:
        hops.append((d, min(wl, rem)))
        rem -= min(wl, rem)
        d += 1

    def fill_of(c):
        return jnp.broadcast_to(fillv, x.shape[:-1] + (c,))

    lparts = []
    rparts = []
    for d, c in reversed(hops):       # farthest tile leftmost
        if d > n - 1:
            lparts.append(fill_of(c))
        else:
            blk = _fetch_from(x[..., -c:], d, axis_name)
            lparts.append(jnp.where(idx - d >= 0, blk, fillv))
    for d, c in hops:                 # nearest tile leftmost
        if d > n - 1:
            rparts.append(fill_of(c))
        else:
            blk = _fetch_from(x[..., :c], -d, axis_name)
            rparts.append(jnp.where(idx + d <= n - 1, blk, fillv))
    left = jnp.concatenate(lparts, axis=-1)
    right = jnp.concatenate(rparts, axis=-1)
    return jnp.concatenate([left, x, right], axis=-1)


def _tile_geom(wl: int, axis_name: str):
    """(n_tiles, tile index, global frame width, global x of local col 0)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    return n, idx, wl * n, idx * wl


def _seam_resolve(value, lflat, lcol_root, rcol_root, key_cols,
                  right_links, dys, n_frame: int, axis_name: str,
                  extra_rounds: int = 6):
    """Exact cross-tile component resolution on the seam-node graph.

    Nodes = the two seam columns of every tile (M = n_tiles*2*H, small);
    same-key nodes (one local component) join star-wise via a
    representative table, cross-seam adjacency comes from `right_links`.
    One all_gather replicates the graph, then hook-and-compress min-union
    runs to the component minimum in O(log M) rounds — worst-case robust
    (a boustrophedon path crossing every seam H times converges just as
    fast), unlike per-round seam relaxation whose round count equals the
    component-hop chain length.

    value/lflat: the local root table and per-pixel local roots.
    key_cols: (2, H) global component key of my left/right seam columns
      (n_frame = sentinel for background nodes).
    right_links: (len(dys), H) — right_links[j, y] links my RIGHT column
      row y to the right neighbor's LEFT column row y+dys[j]; must be
      False on the last tile.
    Returns the updated value table (one scatter-min per side)."""
    import math as _math

    h = key_cols.shape[1]
    n_t = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    m = n_t * 2 * h
    sent_key = jnp.int32(n_frame)
    sent = jnp.int32(m)

    k_all = lax.all_gather(key_cols, axis_name, axis=0)      # (n_t, 2, h)
    keys = k_all.reshape(m)
    node_valid = keys < sent_key
    ids = jnp.arange(m, dtype=jnp.int32)

    # star edges within each key group
    rep_t = jnp.full((n_frame + 1,), sent, jnp.int32).at[
        jnp.clip(keys, 0, n_frame)].min(jnp.where(node_valid, ids, sent))
    rep = rep_t[jnp.clip(keys, 0, n_frame)]
    eu = [ids]
    ev = [jnp.where(node_valid & (rep < sent), rep, ids)]

    if n_t > 1:
        l_all = lax.all_gather(right_links, axis_name, axis=0)
        t_ = jnp.arange(n_t - 1, dtype=jnp.int32)[:, None]
        y_ = jnp.arange(h, dtype=jnp.int32)[None, :]
        for j, dy in enumerate(dys):
            yv = y_ + dy
            ok = (yv >= 0) & (yv < h) & l_all[:-1, j, :]
            u = (t_ * 2 + 1) * h + y_
            v = ((t_ + 1) * 2 + 0) * h + jnp.clip(yv, 0, h - 1)
            eu.append(jnp.where(ok, u, 0).reshape(-1))
            ev.append(jnp.where(ok, v, 0).reshape(-1))
    eu = jnp.concatenate(eu)
    ev = jnp.concatenate(ev)

    parent = ids
    rounds = max(8, int(_math.ceil(_math.log2(max(m, 2)))) + extra_rounds)
    for _ in range(rounds):
        pu = parent[eu]
        pv = parent[ev]
        parent = parent.at[eu].min(pv)
        parent = parent.at[ev].min(pu)
        parent = parent[parent]
        parent = parent[parent]
    for _ in range(4):
        parent = parent[parent]

    minkey = jnp.full((m,), sent_key, jnp.int32).at[parent].min(
        jnp.where(node_valid, keys, sent_key))
    final = minkey[parent]

    my_l = lax.dynamic_slice_in_dim(final, (idx * 2 + 0) * h, h)
    my_r = lax.dynamic_slice_in_dim(final, (idx * 2 + 1) * h, h)
    lv = jnp.where(key_cols[0] < sent_key, my_l, sent_key)
    rv = jnp.where(key_cols[1] < sent_key, my_r, sent_key)
    value = value.at[lcol_root].min(lv, mode="drop")
    value = value.at[rcol_root].min(rv, mode="drop")
    return value


def edge_frontend_tiled(bgr_tile, halo: int = 16,
                        cfg: PipelineConfig = DEFAULT_CONFIG,
                        axis_name: str = "tile"):
    """The edge front-end on a width-tile: returns (edge_thin, edge_bin)
    for the local tile, equal to the single-chip result's tile."""
    if cfg.color_exact:
        # bit-parity mode, same as pipeline/frontend.py:32-39
        labq = color.unpack_labf(color.bgr_to_packed_exact(bgr_tile))
    else:
        labq = color.quantize_labf(color.bgr_to_labf(bgr_tile))
    wide = halo_exchange_w(labq.transpose(2, 0, 1), halo, axis_name)
    labb = jnp.stack([blur.gaussian_blur(wide[c], cfg.blur_radius)
                      for c in range(3)], axis=-1)
    if jax.default_backend() == "tpu":
        # same fused Pallas gradient stage as the single-chip front-end
        # (pipeline/frontend.py); the halo supplies the stencil context,
        # local border artifacts land in the cropped columns
        from rectdetect_tpu.ops.pallas_grad import edge_front_pallas
        em, vec = edge_front_pallas(labb)
    else:
        vec = gradient.edgevec(labb[..., 0])
        em = gradient.edge_lab(color.quantize_labf(labb))
    et = thin.thinthres(em, vec)
    et = et[..., halo:-halo]
    return et, (et > 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# sharded rect tail stages (each equals its single-chip stage's tile)
# ---------------------------------------------------------------------------

def strings_chain_tiled(edge_bin, variant: str, halo: int = 12,
                        axis_name: str = "tile", bridge2: bool = False):
    """strings_chain on a width tile (halo covers the 4-op stencil chain;
    x0 keeps the checkerboard parity and border guards global)."""
    h, wl = edge_bin.shape
    _, _, w, xg0 = _tile_geom(wl, axis_name)
    wide = halo_exchange_w(edge_bin, halo, axis_name, fill="const")
    s = morphology.strings_chain(wide, variant, x0=xg0 - halo, w_total=w,
                                 bridge2=bridge2)
    return s[..., halo:-halo]


def calc_strength_tiled(edge_thin, glabel, scale: float,
                        axis_name: str = "tile"):
    """Global per-component strength table (n+1,), n = H*W_frame: local
    scatter-add keyed by GLOBAL root labels, psum over tiles (integer adds
    — exact vs the single-chip calc_strength; oclimgutil.cl:641-649)."""
    h, wl = glabel.shape
    _, _, w, xg0 = _tile_geom(wl, axis_name)
    n = h * w
    inter = interior_mask(h, wl, 1, xg0, w)
    lbl = glabel.reshape(-1)
    val = jnp.trunc(edge_thin.reshape(-1) ** 2 * scale).astype(jnp.int32)
    ok = inter.reshape(-1) & (lbl > 0)
    tgt = jnp.where(ok, lbl, n)
    partial = jnp.zeros((n + 1,), jnp.int32).at[tgt].add(
        jnp.where(ok, val, 0), mode="drop")
    return lax.psum(partial, axis_name)


def filter_strength_tiled(glabel, strength, thre: int,
                          axis_name: str = "tile"):
    """filter_strength with global labels + the psum'd strength table
    (oclimgutil.cl:651-657); interior means the TRUE frame border.
    No rescue pass here (ccl.rescue_filtered): the tiled labels are
    EXACT components, under which the rescue is a mathematical no-op
    (a killed pixel adjacent to a survivor would share its component
    and its above-threshold total)."""
    h, wl = glabel.shape
    _, _, w, xg0 = _tile_geom(wl, axis_name)
    inter = interior_mask(h, wl, 1, xg0, w)
    lbl = glabel.reshape(-1)
    st = strength[jnp.clip(lbl, 0, strength.shape[0] - 1)]
    kill = (lbl <= 0) | (st < thre)
    return jnp.where(inter.reshape(-1) & kill, -1, lbl).reshape(h, wl)


def blblur_tiled(packed, edge, iters: int = 10, halo: int | None = None,
                 axis_name: str = "tile"):
    """Edge-limited blur on a width tile.  One exchange up front: the
    horizontal pass reaches ±5 columns per iteration (window ±4, break
    tests ±5) and the vertical pass only reads the static edge map one
    column across, so halo >= 5*iters + 5 makes the crop exact.  The
    q<0 / q>limit-1 border breaks run in global coords (x0/w_total), so
    beyond-frame fill never contributes."""
    if halo is None:
        halo = 5 * iters + 6          # exactness bound; 56 at iters=10
    h, wl = packed.shape
    _, _, w, xg0 = _tile_geom(wl, axis_name)
    wp = halo_exchange_w(packed, halo, axis_name, fill="const")
    we = halo_exchange_w(edge, halo, axis_name, fill="const")
    out = regions.blblur(wp, we, iters, x0=xg0 - halo, w_total=w)
    return out[..., halo:-halo]


def quantize_despeckle_tiled(blurred, edge_thin, cfg: PipelineConfig,
                             axis_name: str = "tile"):
    """quantize + despeckle (oclrect.c:300-303) on a width tile.  The
    beyond-frame halo is marked "on edge" (huge edge magnitude) so
    despeckle's candidate scan excludes it exactly like the single-chip
    in-bounds test."""
    halo = 2
    wp = halo_exchange_w(blurred, halo, axis_name, fill="const")
    we = halo_exchange_w(edge_thin, halo, axis_name, fill="const",
                         fill_value=1e9)
    out = regions.quantize_despeckle(wp, we, cfg.quantize_levels,
                                     cfg.quantize_levels,
                                     cfg.quantize_levels)
    return out[..., halo:-halo]


def junction_merge_mask_tiled(strong_lbl, axis_name: str = "tile"):
    """simple_junction + merge mask (oclrect.cl:246-287): dilations reach
    <= 8 px + 1 px junction support."""
    halo = 12
    h, wl = strong_lbl.shape
    _, _, w, xg0 = _tile_geom(wl, axis_name)
    wide = halo_exchange_w(strong_lbl, halo, axis_name, fill="const",
                           fill_value=-1)
    m = regions.junction_merge_mask(wide, x0=xg0 - halo, w_total=w)
    return m[..., halo:-halo]


def label_merge_tiled(despeck, mask, strong_lbl,
                      cfg: PipelineConfig = DEFAULT_CONFIG,
                      axis_name: str = "tile"):
    """Region-merge CCL across width tiles (labelMergeMain,
    oclrect.cl:300-334): local fixpoint over LOCAL indices, then the
    exact seam-graph resolve over the 4-connected cross-seam link —
    computed by _merge_pairs itself on the exchanged two-column seam
    strip, so the predicate has a single source of truth.  Returns
    GLOBAL min-flat-index labels.
    """
    h, wl = despeck.shape
    n_t, idx, w, xg0 = _tile_geom(wl, axis_name)
    gsent = jnp.int32(h * w)

    local = regions.label_merge(despeck, mask, strong_lbl,
                                cfg.labelmerge_passes, cfg.labelmerge_jumps,
                                x0=xg0, w_total=w)
    lflat = local.reshape(-1)                       # local flat root ids

    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xg = jnp.arange(wl, dtype=jnp.int32)[None, :] + xg0
    gidx = (yy * w + xg).reshape(-1)
    value = jnp.full((h * wl,), gsent, jnp.int32)
    value = value.at[lflat].min(gidx)               # global idx of each root

    right_src = [((i + 1) % n_t, i) for i in range(n_t)]

    # the right neighbor's first-column data, received once; the seam
    # link is then _merge_pairs on the two-column strip [my last col |
    # neighbor's first col] with the strip's global x — identical rules
    # to the in-tile links by construction.  The up-equality the
    # preprocess seed needs (oclrect.cl:293-296) is a property of column
    # b alone, so it crosses precomputed (the strip's own up-shift of
    # column b matches: up_eq is columnwise).
    from_right = lax.ppermute(
        jnp.stack([despeck[:, 0], mask[:, 0], strong_lbl[:, 0]]),
        axis_name, right_src)
    strip_p = jnp.stack([despeck[:, -1], from_right[0]], axis=1)
    strip_m = jnp.stack([mask[:, -1], from_right[1]], axis=1)
    strip_e = jnp.stack([strong_lbl[:, -1], from_right[2]], axis=1)
    seam_x = (idx + 1) * wl - 1
    mh_strip, _ = regions._merge_pairs(strip_p, strip_m, strip_e,
                                       x0=seam_x, w_total=w)
    link_r = mh_strip[:, 0] & (idx < n_t - 1)

    glabel = value[lflat].reshape(h, wl)
    key_cols = jnp.stack([glabel[:, 0], glabel[:, -1]])
    value = _seam_resolve(value, lflat, lflat.reshape(h, wl)[:, 0],
                          lflat.reshape(h, wl)[:, -1], key_cols,
                          link_r[None, :], (0,), h * w, axis_name)
    return value[lflat].reshape(h, wl)


def label_sizes_tiled(glabel, axis_name: str = "tile"):
    """Global size histogram (calcSize, oclrect.cl:336-348): (n+1,) with
    the last slot pinned 0 (used as the inert beyond-frame fill in
    despeckle2_tiled)."""
    h, wl = glabel.shape
    _, _, w, _ = _tile_geom(wl, axis_name)
    n = h * w
    tgt = jnp.clip(glabel.reshape(-1), 0, n - 1)
    partial = jnp.zeros((n + 1,), jnp.int32).at[tgt].add(1)
    return lax.psum(partial, axis_name)


def despeckle2_tiled(glabel, sizes_ext, thre: int,
                     axis_name: str = "tile"):
    """despeckle2 (oclrect.cl:350-371) on a width tile: 3x3 first-max
    absorb using the psum'd global size table.  Beyond-frame candidates
    carry label n (size 0) so the strict s > best test drops them exactly
    like the single-chip in-bounds check."""
    h, wl = glabel.shape
    _, _, w, _ = _tile_geom(wl, axis_name)
    n = h * w
    wide = halo_exchange_w(glabel, 1, axis_name, fill="const",
                           fill_value=n)
    wp = pad2d(wide, 1, "zero", constant=n)         # y pad: size-0 slot too
    szp = sizes_ext[jnp.clip(wp, 0, n)]
    ww = wide.shape[-1]

    sz_at = sizes_ext[jnp.clip(glabel, 0, n)]
    small = sz_at <= thre
    best_sz = jnp.zeros((h, ww), jnp.int32)
    best_lb = wide
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cand = shifted(wp, 1, dy, dx, h, ww)
            s = shifted(szp, 1, dy, dx, h, ww)
            take = s > best_sz
            best_sz = jnp.where(take, s, best_sz)
            best_lb = jnp.where(take, cand, best_lb)
    out = jnp.where(small, best_lb[:, 1:-1], glabel)
    return out.astype(jnp.int32)


def mark_boundary_tiled(glabel, axis_name: str = "tile"):
    """markBoundary (oclrect.cl:373-390) on a width tile: 5x5 different-
    label test; the 2 px TRUE frame border is -1 (global interior)."""
    h, wl = glabel.shape
    _, _, w, xg0 = _tile_geom(wl, axis_name)
    inter = interior_mask(h, wl, 2, xg0, w)
    wide = halo_exchange_w(glabel, 2, axis_name, fill="const",
                           fill_value=-1)
    wp = pad2d(wide, 2, "edge")
    ww = wide.shape[-1]
    diff = jnp.zeros((h, ww), bool)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            diff = diff | (shifted(wp, 2, dy, dx, h, ww) != wide)
    diff = diff[:, 2:-2]
    return jnp.where(inter & diff, glabel, -1).astype(jnp.int32)


def rect_tail_tiled(packed_tile, edge_thin_tile, edge_bin_tile, tan_aov,
                    cfg: PipelineConfig = DEFAULT_CONFIG,
                    axis_name: str = "tile"):
    """The full rect tail with every stage before the geometry tail
    sharded over width tiles (matches pipeline/rect.rect_tail with the
    dense/exact labeling path).  The polyline/hypothesis/pose tail runs
    replicated on the two gathered maps."""
    from rectdetect_tpu.pipeline.rect import rect_geometry_tail

    s = strings_chain_tiled(edge_bin_tile, "rect", axis_name=axis_name,
                            bridge2=cfg.bridge_gap2)
    glabel = ccl_tiled(s, 0, cfg=cfg, axis_name=axis_name)
    st = calc_strength_tiled(edge_thin_tile, glabel, cfg.strength_scale,
                             axis_name)
    weak = filter_strength_tiled(glabel, st, cfg.strength_weak, axis_name)
    weak_bin = (weak > 0).astype(jnp.int32)

    blurred = blblur_tiled(packed_tile, weak_bin, cfg.blblur_iters,
                           axis_name=axis_name)
    despeck = quantize_despeckle_tiled(blurred, edge_thin_tile, cfg,
                                       axis_name)

    strong = filter_strength_tiled(weak, st, cfg.strength_strong,
                                   axis_name)
    strong_bin = (strong > 0).astype(jnp.int32)

    mask = junction_merge_mask_tiled(strong, axis_name)
    seg = label_merge_tiled(despeck, mask, strong, cfg, axis_name)
    sizes = label_sizes_tiled(seg, axis_name)
    seg = despeckle2_tiled(seg, sizes, cfg.despeckle2_thre, axis_name)

    bmark = mark_boundary_tiled(seg, axis_name)
    boundary = ccl_tiled(bmark, -1, cfg=cfg, axis_name=axis_name)

    sb = lax.all_gather(strong_bin, axis_name, axis=1, tiled=True)
    bd = lax.all_gather(boundary, axis_name, axis=1, tiled=True)
    return rect_geometry_tail(sb, bd, tan_aov, cfg, axis_name=axis_name)


def rect_step_tiled(frame_tile, tan_aov, halo: int = 16,
                    cfg: PipelineConfig = DEFAULT_CONFIG,
                    axis_name: str = "tile"):
    """Full rect detection for one frame whose width is sharded over the
    tile axis (call inside shard_map).

    Every stage up to boundary labeling runs sharded (halo-exchange
    stencils, cross-tile CCL root tables, psum'd component tables); the
    geometry tail (polylines -> hypotheses -> pose) runs replicated on
    all_gathers of the strong-edge and boundary maps, except the arc
    walk's doubling gathers, which shard by slot range.  Returns a
    full-frame RectResult, identical on every tile rank."""
    et, eb = edge_frontend_tiled(frame_tile, halo, cfg, axis_name)
    if cfg.color_exact:
        packed_local = color.bgr_to_packed_exact(frame_tile)
    else:
        packed_local = color.pack_lab(color.bgr_to_labf(frame_tile))
    return rect_tail_tiled(packed_local, et, eb, tan_aov, cfg,
                           axis_name=axis_name)


def poly_step_tiled(frame_tile, cfg: PipelineConfig = DEFAULT_CONFIG,
                    minerror: float = 1.0, size_thre: int = 20,
                    strength: int = 2000, halo: int = 16,
                    axis_name: str = "tile"):
    """The poly/vidpoly pipeline with the front-end and the edge
    labeling sharded over width tiles; the polyline stage runs
    replicated on the gathered filtered edge map, with the arc walk's
    doubling gathers sharded by slot range (same placement as
    rect_tail_tiled's geometry tail).  Returns (SegmentArena, lsid),
    identical on every tile rank."""
    et, eb = edge_frontend_tiled(frame_tile, halo, cfg, axis_name)
    glabel = ccl_tiled(eb, 0, cfg=cfg, axis_name=axis_name)
    st = calc_strength_tiled(et, glabel, cfg.strength_scale, axis_name)
    filtered = filter_strength_tiled(glabel, st, strength, axis_name)
    edge = (filtered > 0).astype(jnp.int32)
    ef = lax.all_gather(edge, axis_name, axis=1, tiled=True)
    ih, iw = ef.shape
    from rectdetect_tpu.ops import polyline as pl_ops
    cap = cfg.ls_cap_for(iw, ih)
    return pl_ops.polyline_execute(ef, minerror, size_thre, cap, cfg,
                                   axis_name=axis_name)


def rect_step_tiled_gather(frame_tile, tan_aov, halo: int = 16,
                           cfg: PipelineConfig = DEFAULT_CONFIG,
                           axis_name: str = "tile"):
    """The tiled-front-end-only variant: front-end products are
    all_gather'd and the whole tail runs replicated per tile.  Kept as
    the oracle for rect_step_tiled and for latency comparisons (the
    sharded tail pays collectives; this pays replicated compute)."""
    from jax import lax as _lax
    from rectdetect_tpu.pipeline.rect import rect_tail

    et, eb = edge_frontend_tiled(frame_tile, halo, cfg, axis_name)
    if cfg.color_exact:
        packed_local = color.bgr_to_packed_exact(frame_tile)
    else:
        packed_local = color.pack_lab(color.bgr_to_labf(frame_tile))
    packed = _lax.all_gather(packed_local, axis_name, axis=1, tiled=True)
    etf = _lax.all_gather(et, axis_name, axis=1, tiled=True)
    ebf = _lax.all_gather(eb, axis_name, axis=1, tiled=True)
    return rect_tail(packed, etf, ebf, tan_aov, cfg)


def ccl_tiled(pix_tile, bgc: int,
              cfg: PipelineConfig = DEFAULT_CONFIG,
              axis_name: str = "tile"):
    """8-connected equal-value CCL across width tiles.

    pix_tile: (H, Wl).  Returns GLOBAL flat-index labels (y * W +
    x_global), -1 background — identical to the single-chip
    label_components on the stitched frame (the seam-graph resolve is
    exact regardless of seam-crossing counts).
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

    # 3. exact seam-graph resolve: 8-connected equal-value adjacency
    # between my right column and the neighbor's left column
    right_src = [((i + 1) % n, i) for i in range(n)]
    fg = (pix_tile != bgc)
    pix_r = pix_tile[:, -1].astype(jnp.int32)
    nb = lax.ppermute(
        jnp.stack([pix_tile[:, 0].astype(jnp.int32),
                   fg[:, 0].astype(jnp.int32)]), axis_name, right_src)
    dys = (-1, 0, 1)
    links = []
    for dy in dys:
        nb_pix = jnp.roll(nb[0], -dy)
        nb_fg = jnp.roll(nb[1], -dy) != 0
        links.append((nb_pix == pix_r) & nb_fg & fg[:, -1])
    right_links = jnp.stack(links) & (idx < n - 1)

    glabel0 = value[lflat].reshape(h, wl)
    key_cols = jnp.stack([jnp.where(fg[:, 0], glabel0[:, 0], gsent),
                          jnp.where(fg[:, -1], glabel0[:, -1], gsent)])
    value = _seam_resolve(value, lflat, lflat.reshape(h, wl)[:, 0],
                          lflat.reshape(h, wl)[:, -1], key_cols,
                          right_links, dys, h * w, axis_name)
    glabel = value[lflat].reshape(h, wl)
    return jnp.where(fg, glabel, -1)
