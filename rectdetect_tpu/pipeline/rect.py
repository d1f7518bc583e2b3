"""The rect/vidrect pipeline: frame -> detected rectangles with 3D pose.

Single jitted XLA program reproducing the reference's per-frame DAG
(genGPUTask, oclrect.c:235-381) AND its CPU hypothesis/pose stage
(executeCPUTask, oclrect.c:1049-1226) — the latter moved on-chip and
batched (SURVEY.md §7: the biggest architectural departure; it removes the
per-frame device->host roundtrip of the segment arena, hash table and
boundary map).

Stage order and constants follow the citations inline.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG
from rectdetect_tpu.geometry import pose as gpose
from rectdetect_tpu.geometry import quad as gquad
from rectdetect_tpu.geometry.clip import clip_segments
from rectdetect_tpu.ops import ccl, morphology, polyline, regions, reduce_ls
from rectdetect_tpu.pipeline.frontend import edge_frontend


class RectResult(NamedTuple):
    """Detected rectangles; fixed capacity G with a valid mask (the
    reference returns a dynamic rect_t list, oclrect.h:5-15)."""
    c2: jnp.ndarray      # (G,4,2) image-space corners, top-left first
    c3: jnp.ndarray      # (G,4,3) 3D corners (unit-side scale)
    value: jnp.ndarray   # (G,) pose residual
    status: jnp.ndarray  # (G,) bit0: looks like a screen; bit1: polyline src
    valid: jnp.ndarray   # (G,) hypothesis survived reduction


def _members_from_matrix(m, n_groups: int, k: int):
    """First k member segment ids per group from a membership matrix
    (n_groups+1, cap) -> (ids (n_groups, k), valid (n_groups, k)).

    Oracle/tools path only: production uses the sparse-relation
    reduce_ls.first_k_members (identical selection, O(relation) memory
    instead of a transient G*cap int32 score matrix)."""
    cap = m.shape[1]
    lsids = jnp.arange(cap, dtype=jnp.int32)
    score = jnp.where(m[1:], cap - lsids[None, :], 0)
    vals, idx = jax.lax.top_k(score, k)
    return idx.astype(jnp.int32), vals > 0


@functools.partial(jax.jit, static_argnames=("cfg", "iw", "ih"))
def _hypotheses(arena, lsid, boundary, iw: int, ih: int,
                cfg: PipelineConfig, comp=None):
    """Both hypothesis sources -> (segs (G,K,2,2), valid (G,K),
    status_base (G,)) ready for reduction."""
    gmax = cfg.max_groups
    k = cfg.max_group_segs
    cap = arena.cap
    nentry = iw * ih * 4 // 5

    # lsid>0 pixels are post-size-filter arc pixels (sparse; see
    # arc_sparse_factor), so the reduceLS scatters compact accordingly —
    # reusing polyline_execute's arc compaction when provided
    table = reduce_ls.pair_bbox_table(
        boundary, lsid, nentry,
        edge_cap=max(4096, iw * ih // cfg.arc_sparse_factor), comp=comp,
        bids_bh=cfg.bids_bh)
    _, flat2dense, _, rank = reduce_ls.densify_labels(boundary, bg=-1)

    # --- source A: region boundaries (oclrect.c:1064-1171) ---------------
    ids_a, mv_a, counts = reduce_ls.probe_members(
        boundary, arena, gmax, flat2dense, k, cfg.probe_n,
        cfg.probe_dist)
    # boundary group g's original (flat) label = its root pixel index;
    # the g-th root in flat order has dense id g, so log-probe the root
    # rank instead of scattering the full frame (reduce_ls.dense_roots)
    roots = reduce_ls.dense_roots(boundary, gmax, bg=-1, rank=rank)

    group_ok_a = counts[1:] >= 4                        # oclrect.c:1108

    seg_xy = jnp.stack([arena.sx, arena.sy, arena.ex, arena.ey], axis=1)
    raw_a = seg_xy[ids_a]                               # (G,K,4)
    segid_a = roots[1:][:, None].astype(jnp.int32)      # (G,1) flat label
    hsh = reduce_ls._hash(ids_a, jnp.broadcast_to(segid_a, ids_a.shape),
                          nentry)
    # ONE packed row gather for all six per-entry fields (random-row
    # gathers cost per row, docs/SOL.md)
    packed_t = jnp.concatenate(
        [table.owner_lsid[:, None], table.owner_bid[:, None], table.bb],
        axis=1)
    trows = packed_t[hsh]                               # (G,K,6)
    own_ls = trows[..., 0]
    own_bid = trows[..., 1]
    bb = trows[..., 2:6]                                # (G,K,4)
    boxes = jnp.stack([iw - bb[..., 0], ih - bb[..., 2],
                       bb[..., 1], bb[..., 3]], axis=-1).astype(jnp.float32)
    clipped = clip_segments(raw_a, boxes)
    owned = (own_ls == ids_a) & (own_bid == segid_a)
    empty = own_ls == 0
    # owner match -> clipped (dropped if clip rejects); other nonzero
    # owner -> unclipped; empty slot -> dropped (oclrect.c:1116-1131)
    use = jnp.where(owned[..., None], clipped, raw_a)
    valid_a = mv_a & group_ok_a[:, None] & ~empty & \
        ~(owned & jnp.isnan(clipped[..., 0]))
    segs_a = jnp.nan_to_num(use).reshape(gmax, k, 2, 2)

    # --- source B: whole polylines (oclrect.c:1175-1217) -----------------
    ids_b, mv_b = reduce_ls.chain_members(arena, gmax, k,
                                          cfg.ls_min_len_polyline)
    segs_b = seg_xy[ids_b].reshape(gmax, k, 2, 2)

    segs = jnp.concatenate([segs_a, segs_b], axis=0)
    valid = jnp.concatenate([valid_a, mv_b], axis=0)
    status = jnp.concatenate([jnp.zeros((gmax,), jnp.int32),
                              jnp.full((gmax,), 2, jnp.int32)])
    return segs, valid, status


@functools.partial(jax.jit, static_argnames=("cfg",))
def rect_frame(bgr, tan_aov, cfg: PipelineConfig = DEFAULT_CONFIG
               ) -> RectResult:
    """BGR (H,W,3) uint8 frame -> RectResult."""
    fe = edge_frontend(bgr, cfg)
    return rect_tail(fe.packed0, fe.edge_thin, fe.edge_bin, tan_aov, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def rect_frames(frames, tan_aov, cfg: PipelineConfig = DEFAULT_CONFIG
                ) -> RectResult:
    """Batched throughput mode: frames (B,H,W,3) -> RectResult with a
    leading B axis.  One compiled program per batch shape; amortizes
    dispatch and fills the chip better than frame-at-a-time (the
    single-frame path is the latency mode, mirroring the reference's
    per-frame loop)."""
    def one(f):
        fe = edge_frontend(f, cfg)
        return rect_tail(fe.packed0, fe.edge_thin, fe.edge_bin, tan_aov,
                         cfg)
    return jax.vmap(one)(frames)


def weak_strong_labels(edge_bin, edge_thin, cfg: PipelineConfig):
    """Weak/strong edge labeling (oclrect.c:262-312): stringify, label,
    strength-filter at both thresholds.  Returns (weak_lbl,
    strong_lbl_or_None, st_or_None, scomp_or_None); when strong comes
    back None the caller derives it from (weak_lbl, st, scomp) — the
    staged form the rescue extension needs.

    The reference labels with bgc=-1 (every pixel, oclrect.c:274);
    zero-valued components always die at the strength filter (their
    thinned edge magnitude is 0), so labeling only the set pixels
    (bgc=0, sparse) is interior-equivalent — the only deviation is at
    frame borders, where the reference accidentally marks border pixels
    of isolated zero-islands as "edges" for the downstream blur.

    Shared by rect_tail and the measurement tools (tools/tail_bisect,
    tools/full_bisect) so the measured program IS the production
    program."""
    from rectdetect_tpu.ops.compact import compact_mask

    ih, iw = edge_bin.shape
    sp = (max(4096, ih * iw // cfg.sparse_factor)
          if cfg.sparse_factor else None)
    s = morphology.strings_chain(edge_bin, "rect",
                                 bridge2=cfg.bridge_gap2,
                                 bh=cfg.morph_bh)
    if sp is not None:
        # labels feed only calcStrength/filterStrength -> capped
        # block-local pieces are output-equivalent (pallas_ccl.
        # label_components_pieces; validated in test_pallas_ccl)
        lbl = ccl.label_components_adaptive(
            s, 0, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, ih * iw // 8), big_cap=sp,
            round_cap=cfg.weak_ccl_round_cap, pieces_ok=True,
            bh=cfg.ccl_bh or cfg.pieces_bh or None)
    else:
        lbl = ccl.label_components(s, 0, cfg.ccl_passes,
                                   cfg.ccl_jumps,
                                   bh=cfg.ccl_bh or None)
    if sp is not None and not cfg.strength_rescue_rounds:
        # fused calcStrength + both filters: one slot gather instead
        # of six (ccl.strength_filter_pair); the rescue extension
        # needs the staged form (it edits weak before strong).
        # Runtime small-capacity switch (same pattern as the
        # polyline strings switch): the pair's sort/gather/scatter
        # all scale with the slot cap, and the calibrated
        # sparse_factor carries a 1.6x safety margin — when the
        # frame's strings fit the tighter small cap the pair runs
        # there with exactly equal output (compact_mask drops
        # nothing below the cap).
        sp_small_r = (max(4096, ih * iw // cfg.rect_strings_small)
                      if cfg.rect_strings_small else 0)

        def _pair_at(cap2):
            sc = compact_mask((s != 0).reshape(-1), cap2)
            wk, st_, _ = ccl.strength_filter_pair(
                edge_thin, lbl, sc, cfg.strength_weak,
                cfg.strength_strong, cfg.strength_scale)
            return wk, st_

        if sp_small_r and sp_small_r < sp:
            fgc = jnp.sum((s != 0).astype(jnp.int32))
            if cfg.pin_rect_strings == 1:
                weak_lbl, strong_lbl_f = _pair_at(sp_small_r)
            elif cfg.pin_rect_strings == 2:
                weak_lbl, strong_lbl_f = _pair_at(sp)
            else:
                weak_lbl, strong_lbl_f = jax.lax.cond(
                    fgc <= sp_small_r,
                    lambda _: _pair_at(sp_small_r),
                    lambda _: _pair_at(sp), None)
        else:
            weak_lbl, strong_lbl_f = _pair_at(sp)
        return weak_lbl, strong_lbl_f, None, None
    scomp = (compact_mask((s != 0).reshape(-1), sp)
             if sp is not None else None)
    st = ccl.calc_strength(edge_thin, lbl, cfg.strength_scale,
                           comp=scomp)
    weak_lbl = ccl.filter_strength(lbl, st, cfg.strength_weak,
                                   comp=scomp)
    if cfg.strength_rescue_rounds:
        weak_lbl = ccl.rescue_filtered(lbl, weak_lbl,
                                       cfg.strength_rescue_rounds)
    return weak_lbl, None, st, scomp


@functools.partial(jax.jit, static_argnames=("cfg",))
def rect_tail(packed0, edge_thin, edge_bin, tan_aov,
              cfg: PipelineConfig = DEFAULT_CONFIG) -> RectResult:
    """Everything after the edge front-end (oclrect.c:262-381 +
    executeCPUTask).  Split out so the tiled/distributed front-end
    (dist/tile.py) can feed it."""
    ih, iw = packed0.shape[:2]
    sp = (max(4096, ih * iw // cfg.sparse_factor)
          if cfg.sparse_factor else None)
    spb = (max(4096, ih * iw // cfg.boundary_sparse_factor)
           if cfg.sparse_factor else None)

    with jax.named_scope("edge_labeling"):
        weak_lbl, strong_lbl_f, st, scomp = weak_strong_labels(
            edge_bin, edge_thin, cfg)
        weak_bin = (weak_lbl > 0).astype(jnp.int32)

    # edge-limited blur + quantize + despeckle (oclrect.c:286-303)
    with jax.named_scope("region_smoothing"):
        blurred = regions.blblur(packed0, weak_bin, cfg.blblur_iters,
                                 block=cfg.blblur_block,
                                 fuse=cfg.blblur_fuse)
        despeck = regions.quantize_despeckle(blurred, edge_thin,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels,
                                             bh=cfg.quant_bh)

    # strong edges (oclrect.c:307-312)
    if strong_lbl_f is not None:
        strong_lbl = strong_lbl_f
    else:
        strong_lbl = ccl.filter_strength(weak_lbl, st, cfg.strength_strong,
                                         comp=scomp)
        if cfg.strength_rescue_rounds:
            strong_lbl = ccl.rescue_filtered(weak_lbl, strong_lbl,
                                             cfg.strength_rescue_rounds)
    strong_bin = (strong_lbl > 0).astype(jnp.int32)

    # merge masks + region CCL + cleanup (oclrect.c:314-336)
    with jax.named_scope("region_merge"):
        mask = regions.junction_merge_mask(strong_lbl)
        seg = regions.label_merge(despeck, mask, strong_lbl,
                                  cfg.labelmerge_passes,
                                  cfg.labelmerge_jumps,
                                  bh=cfg.ccl_bh or cfg.merge_bh or None)
        seg = regions.sizes_despeckle2(seg, cfg.despeckle2_thre,
                                       cfg.region_run_factor,
                                       pin=cfg.pin_region_runs)

    # boundary labeling (oclrect.c:340-342).  Boundary strips are ~1-5%
    # dense on typical frames but worst-case ~30%; pick the slot capacity
    # at runtime (both branches exact).
    bmark = regions.mark_boundary(seg)
    if spb is not None:
        # seam-exact but round-capped: real region boundaries converge in
        # << cap rounds (scans close straight strips); only percolated
        # noise boundaries fragment, and their pieces either keep a valid
        # root or drop out of grouping via densify_labels
        boundary = ccl.label_components_adaptive(
            bmark, -1, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, ih * iw // 16), big_cap=spb,
            round_cap=cfg.boundary_ccl_round_cap,
            force_xla=cfg.boundary_tpu_sparse,
            bh=cfg.ccl_bh or cfg.boundary_bh or None)
    else:
        boundary = ccl.label_components(bmark, -1, cfg.ccl_passes,
                                        cfg.ccl_jumps,
                                        bh=cfg.ccl_bh or None)

    return rect_geometry_tail(strong_bin, boundary, tan_aov, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "axis_name"))
def rect_geometry_tail(strong_bin, boundary, tan_aov,
                       cfg: PipelineConfig = DEFAULT_CONFIG,
                       axis_name: str | None = None) -> RectResult:
    """Polylines + hypotheses + pose given the full-frame strong-edge map
    and boundary labels (oclrect.c:361-381 + executeCPUTask).  Split out
    so the width-tiled path (dist/tile.py) can run everything before it
    sharded and this part replicated on the two gathered maps —
    replicated except the arc walk's doubling gathers, which shard by
    slot range over `axis_name` when given (chain._doubling_rows)."""
    ih, iw = strong_bin.shape

    # polylines on strong edges (oclrect.c:361)
    with jax.named_scope("polyline"):
        cap = cfg.ls_cap_for(iw, ih)
        arena, lsid, plcomp = polyline.polyline_execute(
            strong_bin, cfg.minerror_rect, cfg.size_thre_rect, cap, cfg,
            return_comp=True, axis_name=axis_name)

    # hypotheses + reduction + pose (oclrect.c:1049-1226, on-chip)
    with jax.named_scope("hypotheses"):
        segs, valid, status = _hypotheses(arena, lsid, boundary, iw, ih,
                                          cfg, comp=plcomp)
        corners, ok = gquad.reduce_groups(segs, valid,
                                          cfg.hull_max_vertices)
    with jax.named_scope("pose"):
        c2, c3, val = gpose.pose_estimate(corners, iw, ih, tan_aov,
                                          cfg.cg_iters,
                                          cfg.cg_line_search_iters)
    screen = gpose.looks_like_a_screen(c2, c3, val, cfg.accept_value,
                                       cfg.aspect_limit,
                                       cfg.offset_ratio_limit)
    status = status | jnp.where(screen, 1, 0)
    # degenerate rejected groups can carry NaN through the pose math;
    # sanitize so reductions over the fixed-capacity result are safe
    ok = ok & jnp.isfinite(val)
    val = jnp.where(ok, val, jnp.inf)
    c2 = jnp.where(ok[:, None, None], jnp.nan_to_num(c2), 0.0)
    c3 = jnp.where(ok[:, None, None], jnp.nan_to_num(c3), 0.0)
    return RectResult(c2=c2, c3=c3, value=val, status=status, valid=ok)


@functools.partial(jax.jit, static_argnames=("cfg",))
def rect_stage_images(bgr, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Intermediate stage images for the debug-dump subsystem — the same
    observability points the reference left as commented-out visualization
    hooks (oclrect.c:255-363).  Returns a dict of (kind, array) pairs for
    utils.debug.StageDumper."""
    fe = edge_frontend(bgr, cfg)
    jn = morphology.simple_junction(fe.edge_bin, positive_only=True)
    conn = morphology.simple_connect_rect(jn)
    if cfg.bridge_gap2:
        conn = morphology.simple_connect2(conn)
    s = morphology.stringify(conn, 0)
    s = morphology.stringify(s, 1)
    lbl = ccl.label_components(s, 0, cfg.ccl_passes, cfg.ccl_jumps,
                               bh=cfg.ccl_bh or None)
    st = ccl.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
    weak_lbl = ccl.filter_strength(lbl, st, cfg.strength_weak)
    if cfg.strength_rescue_rounds:
        weak_lbl = ccl.rescue_filtered(lbl, weak_lbl,
                                       cfg.strength_rescue_rounds)
    weak_bin = (weak_lbl > 0).astype(jnp.int32)
    blurred = regions.blblur(fe.packed0, weak_bin, cfg.blblur_iters,
                             block=cfg.blblur_block,
                             fuse=cfg.blblur_fuse)
    quant = regions.quantize_packed(blurred)
    despeck = regions.despeckle(quant, fe.edge_thin)
    strong_lbl = ccl.filter_strength(weak_lbl, st, cfg.strength_strong)
    if cfg.strength_rescue_rounds:
        strong_lbl = ccl.rescue_filtered(weak_lbl, strong_lbl,
                                         cfg.strength_rescue_rounds)
    mask = regions.junction_merge_mask(strong_lbl)
    seg = regions.label_merge(despeck, mask, strong_lbl,
                              cfg.labelmerge_passes, cfg.labelmerge_jumps)
    seg = regions.despeckle2(seg, regions.label_sizes(seg),
                             cfg.despeckle2_thre)
    bmark = regions.mark_boundary(seg)
    boundary = ccl.label_components(bmark, -1, cfg.ccl_passes, cfg.ccl_jumps)
    strong_bin = (strong_lbl > 0).astype(jnp.int32)
    _, lsid = polyline.polyline_execute(
        strong_bin, cfg.minerror_rect, cfg.size_thre_rect,
        cfg.ls_cap_for(bgr.shape[1], bgr.shape[0]), cfg)
    return {
        "edge_thin": fe.edge_thin,          # oclrect.c:260
        "weak_labels": weak_lbl,            # oclrect.c:280
        "blblur": blurred,                  # oclrect.c:298
        "despeckled": despeck,              # oclrect.c:305
        "strong_labels": strong_lbl,        # oclrect.c:310
        "merge_mask": mask,                 # oclrect.c:323
        "regions": seg,                     # oclrect.c:338
        "boundary": boundary,               # oclrect.c:344
        "lsid": lsid,                       # oclrect.c:363
    }


# renderer kind per stage, for utils.debug.StageDumper
STAGE_KINDS = {
    "edge_thin": "gray", "weak_labels": "labels", "blblur": "packed",
    "despeckled": "packed", "strong_labels": "labels",
    "merge_mask": "binary", "regions": "labels", "boundary": "labels",
    "lsid": "labels",
}


def live_rects(res: RectResult):
    """Host-side: list of dicts for surviving hypotheses (mirrors the
    rect_t list consumption, rect.cpp:107-121)."""
    import numpy as np
    c2 = np.asarray(res.c2)
    c3 = np.asarray(res.c3)
    val = np.asarray(res.value)
    stat = np.asarray(res.status)
    ok = np.asarray(res.valid)
    out = []
    for i in range(c2.shape[0]):
        if not ok[i]:
            continue
        out.append({"c2": c2[i], "c3": c3[i], "value": float(val[i]),
                    "status": int(stat[i])})
    return out
