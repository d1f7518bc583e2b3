"""Polyline vectorization: binary edge strings -> refined line segments.

This is the TPU re-design of oclpolyline (oclpolyline.c:218-309 +
oclpolyline.cl).  The reference builds a dynamically allocated `lsList` of
LS_t segments (oclpolyline.cl:29-39) using atomics (atomic_inc allocation,
atomic_max distance argmax with a 13-bit random XOR tie-break, 64-bit
atomic moment sums).  Here everything is deterministic dense tensor math:

  * dynamic lsList        -> fixed-capacity SoA SegmentArena (cap slots,
                             slot 0 unused; count scalar)
  * atomic_inc allocation -> prefix-sum ranks over the per-segment split mask
  * atomic_max + rand     -> segment max, ties broken by MIN flat pixel
                             index (unique, deterministic; the reference's
                             XOR rand makes its argmax unique but
                             nondeterministic run-to-run)
  * 64-bit atomic moments -> centered segment sums (numerically better
                             than the reference's raw moment accumulation)
  * refine_pass3 races    -> snap computed simultaneously from pre-snap
                             coordinates

Geometric outputs match the reference within float tolerance; segment *ids*
are deterministic here and scheduler-dependent there (see SURVEY.md §4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rectdetect_tpu.ops import morphology
from rectdetect_tpu.ops.ccl import (component_sizes, filter_size, label_arcs,
                                    label_components, relabel_dense)
from rectdetect_tpu.ops.chain import arc_number, break_loops, count_ends
from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG

MINEDGELEN = 1.0   # oclpolyline.cl:20
MINNINDEX = 4      # oclpolyline.cl:21
FIX = 65536.0      # fixed-point scale for distances (oclpolyline.cl:535)


class SegmentArena(NamedTuple):
    """SoA equivalent of the reference's LS_t list (oclpolyline.cl:29-39).

    All arrays have shape (cap,); slot 0 is unused (the reference stores
    the count in element 0's first word — here `count` is separate).
    """
    sx: jax.Array          # startCoords
    sy: jax.Array
    ex: jax.Array          # endCoords
    ey: jax.Array
    start_index: jax.Array
    end_index: jax.Array
    left_ptr: jax.Array
    right_ptr: jax.Array
    start_count: jax.Array
    end_count: jax.Array
    polyid: jax.Array
    npix: jax.Array
    level: jax.Array
    count: jax.Array       # scalar int32

    @property
    def cap(self) -> int:
        return self.sx.shape[0]


def _seg_scatter(cap, tgt, val, mode, init):
    """Scatter-reduce `val` into cap slots at `tgt` (out-of-range dropped)."""
    out = jnp.full((cap,), init, val.dtype)
    return getattr(out.at[tgt], mode)(val, mode="drop")


def _coords(h, w, dtype=jnp.float32):
    yy = jnp.arange(h, dtype=dtype)[:, None]
    xx = jnp.arange(w, dtype=dtype)[None, :]
    return (jnp.broadcast_to(xx, (h, w)).reshape(-1),
            jnp.broadcast_to(yy, (h, w)).reshape(-1))


def mkpl_init(label, number, cap: int, comp=None) -> SegmentArena:
    """Build the initial one-segment-per-arc arena (mkpl_pass0a/0b,
    oclpolyline.cl:439-506).

    label: (H,W) dense arc ids (1..count, 0 background); number: (H,W)
    arc-length indices.  An arc survives (polyid != 0) iff it has exactly
    one number==1 pixel and >= 2 pixels, like pass0b.

    comp: optional Compaction of the labeled pixels — all segment scatters
    then run over slots (O(edge pixels)) instead of the frame.
    """
    h, w = label.shape
    n = h * w
    if comp is not None:
        live = comp.valid()
        p_s = jnp.clip(comp.idx, 0, n - 1)
        l = jnp.where(live, label.reshape(-1)[p_s], 0).astype(jnp.int32)
        num = jnp.where(live, number.reshape(-1)[p_s], 0).astype(jnp.int32)
        px = (p_s % w).astype(jnp.float32)
        py = (p_s // w).astype(jnp.float32)
        flat = p_s
    else:
        l = label.reshape(-1).astype(jnp.int32)
        num = number.reshape(-1).astype(jnp.int32)
        px, py = _coords(h, w)
        flat = jnp.arange(n, dtype=jnp.int32)

    valid = (l > 0) & (l < cap)
    tgt = jnp.where(valid, l, cap)
    one = jnp.ones_like(l)

    npix = _seg_scatter(cap, tgt, jnp.where(valid, one, 0), "add", 0)
    start_count = _seg_scatter(cap, jnp.where(valid & (num == 1), l, cap),
                               one, "add", 0)
    end_index = _seg_scatter(cap, tgt, jnp.where(valid, num, 0), "max", 0)
    count = jnp.max(jnp.where(valid, l, 0)).astype(jnp.int32)

    # startCoords: the (unique if start_count==1) number==1 pixel.
    sp = _seg_scatter(cap, jnp.where(valid & (num == 1), l, cap), flat,
                      "min", n)
    sp_ok = sp < n
    spc = jnp.clip(sp, 0, n - 1)
    sx = jnp.where(sp_ok, (spc % w).astype(jnp.float32), 0.0)
    sy = jnp.where(sp_ok, (spc // w).astype(jnp.float32), 0.0)

    # endCoords: first pixel reaching the max number (atomic first-writer in
    # the reference; deterministic min-flat-index winner here).
    is_endpix = valid & (num == end_index[jnp.clip(l, 0, cap - 1)]) & (num > 0)
    ep = _seg_scatter(cap, jnp.where(is_endpix, l, cap), flat, "min", n)
    end_count = _seg_scatter(cap, jnp.where(is_endpix, l, cap), one, "add", 0)
    ep_ok = ep < n
    epc = jnp.clip(ep, 0, n - 1)
    ex = jnp.where(ep_ok, (epc % w).astype(jnp.float32), 0.0)
    ey = jnp.where(ep_ok, (epc // w).astype(jnp.float32), 0.0)

    seg_id = jnp.arange(cap, dtype=jnp.int32)
    alive = (start_count == 1) & (npix >= 2) & (end_count >= 1) & (seg_id > 0)
    polyid = jnp.where(alive, seg_id, 0)

    zeros = jnp.zeros((cap,), jnp.int32)
    return SegmentArena(
        sx=sx, sy=sy, ex=ex, ey=ey,
        start_index=zeros, end_index=end_index,
        left_ptr=zeros, right_ptr=zeros,
        start_count=start_count, end_count=end_count,
        polyid=polyid, npix=npix, level=zeros, count=count)


def _closest_point_dist(sx, sy, ex, ey, px, py):
    """Distance from (px,py) to segment (sx,sy)-(ex,ey) (closestPoint,
    oclpolyline.cl:51-59: degenerate segments collapse to the start)."""
    dx = ex - sx
    dy = ey - sy
    l2 = dx * dx + dy * dy
    t = jnp.where(l2 > 1e-4, ((px - sx) * dx + (py - sy) * dy) /
                  jnp.maximum(l2, 1e-4), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    cx = sx + t * dx
    cy = sy + t * dy
    return jnp.hypot(cx - px, cy - py)


def mkpl_subdivide(arena: SegmentArena, label, number, minerror: float,
                   n_iters: int, comp=None, axis_name: str | None = None):
    """Iterative max-deviation subdivision (mkpl_pass1/2/3,
    oclpolyline.cl:509-646; host loop N=16 at oclpolyline.c:186-216).

    Each iteration: per-segment farthest-from-chord pixel; split there when
    the deviation and shape tests pass; relabel pixels past splits one
    right-pointer hop (as in the reference, propagation interleaves with
    further subdivision).  Returns (arena, label).

    With `comp`, per-pixel work runs over the compacted slot list (every
    iteration's arena gathers and distance math are O(edge pixels)).

    axis_name (width-tiled path, dist/tile.py; requires comp): every
    iteration's per-slot work runs on this device's contiguous slot
    slice; the (cap,) segment tables reduce with pmax/pmin and the label
    state reassembles with one all_gather — all-integer reductions, so
    the result is bit-identical to the replicated computation.
    """
    from jax import lax

    h, w = label.shape
    n = h * w
    cap = arena.cap
    if comp is not None:
        live = comp.valid()
        p_s = jnp.clip(comp.idx, 0, n - 1)
        px = (p_s % w).astype(jnp.float32)
        py = (p_s // w).astype(jnp.float32)
        flat = p_s
        num = jnp.where(live, number.reshape(-1)[p_s], 0).astype(jnp.int32)
        label_s = jnp.where(live, label.reshape(-1)[p_s], 0)
    else:
        px, py = _coords(h, w)
        flat = jnp.arange(n, dtype=jnp.int32)
        num = number.reshape(-1).astype(jnp.int32)
        label_s = label.reshape(-1)
    seg_id = jnp.arange(cap, dtype=jnp.int32)
    minerr_fix = int(minerror * FIX)
    n_slots = px.shape[0]
    if axis_name is not None:
        assert comp is not None
        n_sh = lax.axis_size(axis_name)
        chunk = -(-n_slots // n_sh)
        pad = n_sh * chunk - n_slots
        if pad:
            zf = jnp.zeros((pad,), jnp.float32)
            zi = jnp.zeros((pad,), jnp.int32)
            px = jnp.concatenate([px, zf])
            py = jnp.concatenate([py, zf])
            num = jnp.concatenate([num, zi])
            label_s = jnp.concatenate([label_s.astype(jnp.int32), zi])
        n_slots_p = n_slots + pad
        lo = lax.axis_index(axis_name) * chunk
        px_l = lax.dynamic_slice_in_dim(px, lo, chunk)
        py_l = lax.dynamic_slice_in_dim(py, lo, chunk)
        num_l = lax.dynamic_slice_in_dim(num, lo, chunk)
        slot_l = lo + jnp.arange(chunk, dtype=jnp.int32)
    else:
        n_slots_p = n_slots
        px_l, py_l, num_l = px, py, num
        slot_l = jnp.arange(n_slots, dtype=jnp.int32)
    # packed winner-pixel table: one row gather instead of three
    # (num <= chain length < 2^24, exact in f32)
    pxyn = jnp.stack([px, py, num.astype(jnp.float32)], axis=1)

    def _f(x):                       # i32 -> f32 bit pattern (lossless)
        return jax.lax.bitcast_convert_type(x.astype(jnp.int32),
                                            jnp.float32)

    def _i(x):                       # f32 bit pattern -> i32
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def _red(x, mode):
        if axis_name is None:
            return x
        return (lax.pmax if mode == "max" else lax.pmin)(x, axis_name)

    def body(_, state):
        a, l = state
        l_loc = (l if axis_name is None
                 else lax.dynamic_slice_in_dim(l, lo, chunk))
        lc = jnp.clip(l_loc, 0, cap - 1)

        # TPU gathers are per-row overhead-bound, so fetch every per-pixel
        # arena field with ONE row gather of a packed (cap, 5) matrix
        # instead of five scalar gathers.
        packed = jnp.stack([a.sx, a.sy, a.ex, a.ey,
                            a.polyid.astype(jnp.float32)], axis=1)
        rows = packed[lc]                               # (S, 5)
        seg_sx, seg_sy = rows[:, 0], rows[:, 1]
        seg_ex, seg_ey = rows[:, 2], rows[:, 3]
        live_px = (l_loc > 0) & (l_loc < cap) & (rows[:, 4] != 0)

        # pass1: fixed-point distance to the current chord, per pixel.
        d = _closest_point_dist(seg_sx, seg_sy, seg_ex, seg_ey, px_l, py_l)
        dist = (d * FIX).astype(jnp.int32)
        dist = jnp.where(live_px, dist, -1)
        tgt = jnp.where(live_px, l_loc, cap)
        maxdist = _red(_seg_scatter(cap, tgt, dist, "max", -1), "max")

        # winner pixel: min flat index achieving the segment max (the
        # reference uniquifies via rand XOR, oclpolyline.cl:536); slot
        # order equals flat order, so the min slot is the min flat index.
        at_max = live_px & (dist == maxdist[lc]) & (maxdist[lc] >= 0)
        winner = _red(_seg_scatter(cap, jnp.where(at_max, l_loc, cap),
                                   slot_l, "min", n_slots_p), "min")
        has_w = winner < n_slots_p
        wc = jnp.clip(winner, 0, n_slots_p - 1)
        wrows = pxyn[wc]
        wx = wrows[:, 0]
        wy = wrows[:, 1]
        wn = wrows[:, 2].astype(jnp.int32)

        # pass2 split conditions (oclpolyline.cl:564-577).
        md = maxdist
        mdf = md.astype(jnp.float32)
        chord_sq = ((a.ex - a.sx) ** 2 + (a.ey - a.sy) ** 2)
        curv_keep = ~((md < minerr_fix * 3) &
                      (mdf * mdf / jnp.maximum(chord_sq, 1e-30) < 100000.0))
        dss = (wx - a.sx) ** 2 + (wy - a.sy) ** 2
        dse = (wx - a.ex) ** 2 + (wy - a.ey) ** 2
        split = ((a.polyid != 0) & has_w
                 & (a.end_index - a.start_index >= MINNINDEX - 1)
                 & (a.start_count <= 1) & (a.end_count <= 1)
                 & (md >= minerr_fix) & curv_keep
                 & (dss >= MINEDGELEN * MINEDGELEN)
                 & (dse >= MINEDGELEN * MINEDGELEN))

        # deterministic allocation: rank split segments by id.
        ranks = jnp.cumsum(split.astype(jnp.int32))
        gn = a.count + ranks
        split = split & (gn < cap)
        gn = jnp.where(split, a.count + jnp.cumsum(split.astype(jnp.int32)),
                       cap)
        new_count = a.count + jnp.sum(split.astype(jnp.int32))

        # new segment gn covers [wn, end]; old g truncates to [start, wn].
        # TPU scatters cost per row, so write all 13 fields with ONE row
        # scatter of a bitcast-packed (cap, 13) matrix instead of 13
        # scalar scatters (i32 fields move as f32 bit patterns, lossless).
        zi = jnp.zeros_like(seg_id)
        cur = jnp.stack(
            [a.sx, a.sy, a.ex, a.ey, _f(a.start_index), _f(a.end_index),
             _f(a.left_ptr), _f(a.right_ptr), _f(a.polyid), _f(a.level),
             _f(a.npix), _f(a.start_count), _f(a.end_count)], axis=1)
        new = jnp.stack(
            [wx, wy, a.ex, a.ey, _f(wn), _f(a.end_index), _f(seg_id),
             _f(a.right_ptr), _f(a.polyid), _f(md), _f(zi), _f(zi),
             _f(zi)], axis=1)
        cur = cur.at[gn].set(new, mode="drop")
        sx2, sy2, ex2, ey2 = (cur[:, 0], cur[:, 1], cur[:, 2], cur[:, 3])
        sidx2 = _i(cur[:, 4])
        eidx2 = _i(cur[:, 5])
        left2 = _i(cur[:, 6])
        right2 = _i(cur[:, 7])
        polyid2 = _i(cur[:, 8])
        level2 = _i(cur[:, 9])
        npix2 = _i(cur[:, 10])
        sc2 = _i(cur[:, 11])
        ec2 = _i(cur[:, 12])

        # old right neighbor's left pointer -> gn (oclpolyline.cl:614).
        gr_tgt = jnp.where(split & (a.right_ptr != 0), a.right_ptr, cap)
        left2 = left2.at[gr_tgt].set(gn.astype(jnp.int32), mode="drop")

        # update the old (split) segments in place.
        upd = split
        ex2 = jnp.where(upd, wx, ex2)
        ey2 = jnp.where(upd, wy, ey2)
        eidx2 = jnp.where(upd, wn, eidx2)
        right2 = jnp.where(upd, gn, right2).astype(jnp.int32)

        a2 = a._replace(sx=sx2, sy=sy2, ex=ex2, ey=ey2,
                        start_index=sidx2.astype(jnp.int32),
                        end_index=eidx2.astype(jnp.int32),
                        left_ptr=left2.astype(jnp.int32),
                        right_ptr=right2.astype(jnp.int32),
                        start_count=sc2, end_count=ec2,
                        polyid=polyid2.astype(jnp.int32),
                        npix=npix2, level=level2.astype(jnp.int32),
                        count=new_count.astype(jnp.int32))

        # pass3: move pixels past the split one right-pointer hop
        # (fused row gather of the three fields it reads).
        p3 = jnp.stack([a2.end_index, a2.polyid, a2.right_ptr], axis=1)
        rows3 = p3[lc]
        move = live_px & (rows3[:, 0] < num_l) & (rows3[:, 1] != 0)
        l_new = jnp.where(move, rows3[:, 2], l_loc)
        if axis_name is not None:
            l_new = lax.all_gather(l_new, axis_name, axis=0, tiled=True)
        return a2, l_new

    # fixed trip count (oclpolyline.c:186-216): an early-exit while_loop
    # was tried and REGRESSED — the per-iteration convergence reduction
    # plus the dynamic-trip pipeline bubbles cost more than the skipped
    # tail iterations save
    arena, l_end = jax.lax.fori_loop(0, n_iters - 1, body,
                                     (arena, label_s.astype(jnp.int32)))
    l_end = l_end[:n_slots]
    if comp is not None:
        lab = jnp.zeros((n + 1,), jnp.int32).at[
            jnp.where(live, p_s, n)].set(l_end, mode="drop")[:n]
        return arena, lab.reshape(h, w)
    return arena, l_end.reshape(h, w)


def refine(arena: SegmentArena, label, comp=None):
    """Least-squares endpoint refinement + corner snapping (refine_pass0..3,
    oclpolyline.cl:680-809).

    The reference accumulates raw moments in 64-bit atomics and solves the
    2x2 normal equations per segment.  With ax1 == |dir|^2 constant per
    segment this is exactly a linear regression of the perpendicular
    offset `ay` on the chord position `ax0` with an intercept; we compute
    it with centered segment sums (same solution, f32-safe).

    With `comp`, moment sums run over the compacted slot list.
    """
    h, w = label.shape
    n = h * w
    cap = arena.cap
    if comp is not None:
        live = comp.valid()
        p_s = jnp.clip(comp.idx, 0, n - 1)
        l = jnp.where(live, label.reshape(-1)[p_s], 0)
        px = (p_s % w).astype(jnp.float32)
        py = (p_s // w).astype(jnp.float32)
    else:
        l = label.reshape(-1)
        px, py = _coords(h, w)
    lc = jnp.clip(l, 0, cap - 1)
    valid = (l > 0) & (l < cap)
    tgt = jnp.where(valid, l, cap)

    dirx = jnp.rint(arena.ex - arena.sx)
    diry = jnp.rint(arena.ey - arena.sy)
    vdx = -diry
    vdy = dirx
    c = dirx * dirx + diry * diry                  # distSquSE

    sxr = jnp.rint(arena.sx)
    syr = jnp.rint(arena.sy)
    # one fused row gather for the four per-segment fields
    packed = jnp.stack([sxr, syr, dirx, diry], axis=1)
    rows = packed[lc]
    vx = px - rows[:, 0]
    vy = py - rows[:, 1]
    ax0 = vx * rows[:, 2] + vy * rows[:, 3]
    ay = -vx * rows[:, 3] + vy * rows[:, 2]    # v . (-diry, dirx)

    nseg = _seg_scatter(cap, tgt, jnp.where(valid, 1.0, 0.0), "add", 0.0)
    s_x = _seg_scatter(cap, tgt, jnp.where(valid, ax0, 0.0), "add", 0.0)
    s_y = _seg_scatter(cap, tgt, jnp.where(valid, ay, 0.0), "add", 0.0)
    nz = jnp.maximum(nseg, 1.0)
    m_x = s_x / nz
    m_y = s_y / nz
    means = jnp.stack([m_x, m_y], axis=1)[lc]
    dx0 = ax0 - means[:, 0]
    dy0 = ay - means[:, 1]
    var = _seg_scatter(cap, tgt, jnp.where(valid, dx0 * dx0, 0.0), "add", 0.0)
    cov = _seg_scatter(cap, tgt, jnp.where(valid, dx0 * dy0, 0.0), "add", 0.0)

    # rdet == 0 in the reference <=> c == 0, n == 0, or integer variance 0.
    # ax0 takes integer values, so any true nonzero centered variance is
    # >= 0.5; below 0.25 is float noise around the degenerate case.
    ok = (arena.polyid != 0) & (nseg > 0) & (c > 0) & (var > 0.25)
    as0 = jnp.where(ok, cov / jnp.maximum(var, 1e-20), 0.0)
    as1 = jnp.where(ok, (m_y - as0 * m_x) / jnp.maximum(c, 1e-20), 0.0)

    sx = arena.sx + vdx * as1
    sy = arena.sy + vdy * as1
    ex = arena.ex + vdx * (as0 + as1)
    ey = arena.ey + vdy * (as0 + as1)

    # pass3: snap adjacent endpoints to the line-line intersection
    # (oclpolyline.cl:772-809), from pre-snap coordinates (the reference
    # tolerates read/write races here; this is the deterministic version).
    rp = jnp.clip(arena.right_ptr, 0, cap - 1)
    u0, u1 = sx[rp], sy[rp]
    u2, u3 = ex[rp], ey[rp]
    d = (ex - sx) * (u3 - u1) - (ey - sy) * (u2 - u0)
    nq = (sy - u1) * (u2 - u0) - (sx - u0) * (u3 - u1)
    q = nq / jnp.where(jnp.abs(d) < 1e-6, 1.0, d)
    wx = sx + q * (ex - sx)
    wy = sy + q * (ey - sy)
    midx = (ex + u0) * 0.5
    midy = (ey + u1) * 0.5
    far = (jnp.hypot(wx - ex, wy - ey) > 10.0) & \
          (jnp.hypot(wx - u0, wy - u1) > 10.0)
    use_mid = (jnp.abs(d) < 1e-6) | far
    nxx = jnp.where(use_mid, midx, wx)
    nyy = jnp.where(use_mid, midy, wy)

    applies = (arena.polyid != 0) & (arena.right_ptr != 0)
    ex2 = jnp.where(applies, nxx, ex)
    ey2 = jnp.where(applies, nyy, ey)
    h_tgt = jnp.where(applies, arena.right_ptr, cap)
    sx2 = sx.at[h_tgt].set(nxx, mode="drop")
    sy2 = sy.at[h_tgt].set(nyy, mode="drop")

    return arena._replace(sx=sx2, sy=sy2, ex=ex2, ey=ey2)


def polyline_execute(edge_binary, minerror: float, size_thre: int,
                     cap: int, cfg: PipelineConfig = DEFAULT_CONFIG,
                     return_comp: bool = False,
                     axis_name: str | None = None):
    """Full polyline pipeline: binary edge image -> (SegmentArena, lsid).

    Mirrors oclpolyline_execute (oclpolyline.c:218-309): junction ->
    gap bridging -> stringify x2 -> branch removal -> CCL -> loop breaking
    -> arc numbering -> arc labeling -> size filter -> dense relabel ->
    subdivision -> refinement.  lsid is the per-pixel segment-id map.

    return_comp=True additionally returns the arc-pixel Compaction so the
    hypothesis stage (reduce_ls.pair_bbox_table) can reuse it instead of
    re-prefix-summing the frame; lsid > 0 only at compacted pixels.

    axis_name: shard the arc walk's doubling gathers over this mesh axis
    (dist/tile.py runs the geometry tail replicated per tile on gathered
    maps — identical integer inputs, so the capacity-switch predicate
    below and all walk state stay in lockstep across devices).
    """
    h, w = edge_binary.shape
    sp = (max(4096, h * w // cfg.strings_sparse_factor)
          if cfg.sparse_factor else None)

    strings = morphology.strings_chain(edge_binary, "poly_branch",
                                       bridge2=cfg.bridge_gap2,
                                       bh=cfg.morph_bh)

    if sp is not None:
        # runtime slot-capacity switch (same pattern as
        # ccl.label_components_adaptive): when the strings foreground
        # fits the small list, every slot-space table op below runs at
        # the small capacity — exactly equal output, since compact_mask
        # drops nothing when fg <= cap.  Typical post-removeBranch
        # density is ~8-12%; the big cap covers the adversarial ~16%.
        sp_small = max(4096, h * w // cfg.strings_small_factor)
        fg_count = jnp.sum((strings != 0).astype(jnp.int32))
        def small(s):
            return _polyline_tail(s, sp_small, minerror, size_thre, cap,
                                  cfg, axis_name)

        def big(s):
            return _polyline_tail(s, sp, minerror, size_thre, cap, cfg,
                                  axis_name)

        if cfg.pin_strings_branch == 1:
            arena, lsid, comp = small(strings)
        elif cfg.pin_strings_branch == 2:
            arena, lsid, comp = big(strings)
        else:
            arena, lsid, comp = jax.lax.cond(fg_count <= sp_small, small,
                                             big, strings)
        if return_comp:
            return arena, lsid, comp
        return arena, lsid

    arena, lsid, comp = _polyline_tail(strings, None, minerror, size_thre,
                                       cap, cfg, axis_name)
    if return_comp:
        return arena, lsid, comp
    return arena, lsid


def _polyline_tail(strings, sp: int | None, minerror: float,
                   size_thre: int, cap: int, cfg: PipelineConfig,
                   axis_name: str | None = None):
    """polyline_execute after stringification, at one slot capacity."""
    h, w = strings.shape

    if sp is not None:
        return _polyline_tail_sparse(strings, sp, minerror, size_thre,
                                     cap, cfg, axis_name)

    # Dense reference path (CPU fallback / oracle for the sparse path):
    # the literal stage sequence of oclpolyline.c:218-309.
    label = label_components(strings, 0, cfg.ccl_passes, cfg.ccl_jumps)
    jn2 = morphology.simple_junction(strings)
    nends = count_ends(jn2, label)
    strings, label = break_loops(strings, label, nends)

    number, _, _ = arc_number(label, cfg.number_doublings)
    arcs = label_arcs(number, cfg.labelpl_passes, cfg.labelpl_jumps)
    sizes = component_sizes(arcs, ignore=0)
    filtered = filter_size(arcs, sizes, size_thre)
    dense, _ = relabel_dense(filtered)

    arena = mkpl_init(dense, number, cap)
    arena, lsid = mkpl_subdivide(arena, dense, number, minerror,
                                 cfg.mkpl_iters)
    arena = refine(arena, lsid)
    return arena, lsid, None


def _small_component_kill(strings, comp0, size_thre: int,
                          cfg: PipelineConfig):
    """keep_slots (S,) bool: False where the slot's entire 8-connected
    strings component provably has <= size_thre pixels.

    Such components can never yield a kept arc: every walk chain is a
    subset of its component (including broken cycles and the border-
    split deviation), and the arc size filter requires chain length - 1
    > size_thre (polyline tail `keep`).  Dropping them BEFORE the walk
    shrinks the dominant doubling-gather row count to the survivor
    capacity.

    Exact without a converged CCL: a capped block-local pieces flood
    (pallas_ccl.label_components_pieces) + a CLOSURE test — a piece is
    a whole component iff every foreground 8-neighbor of every piece
    pixel carries the same piece label (seam-straddling or unconverged
    pieces have a mismatched-label neighbor and are conservatively
    kept).  Size and closure reduce per piece with the same
    sort-segmented pattern as ccl.strength_filter_pair.
    """
    from jax import lax

    from rectdetect_tpu.ops.pallas_ccl import label_components_pieces
    from rectdetect_tpu.ops.shifts import NEIGH8, pad2d, shifted

    h, w = strings.shape
    n = h * w
    sbin = (strings != 0).astype(jnp.int32)
    pieces = label_components_pieces(sbin, 0, cfg.weak_ccl_round_cap,
                                     bh=cfg.ccl_bh or cfg.pieces_bh
                                     or None)
    pfull = pad2d(pieces, 1, "zero", constant=-7)
    closed = pieces >= 0
    for dy, dx in NEIGH8:
        nb = shifted(pfull, 1, dy, dx, h, w)
        closed = closed & ~((nb >= 0) & (nb != pieces))

    S = comp0.cap
    live = comp0.valid()
    p_s = jnp.clip(comp0.idx, 0, n - 1)
    rows = jnp.stack([pieces.reshape(-1),
                      closed.reshape(-1).astype(jnp.int32)], axis=1)[p_s]
    plbl_s = rows[:, 0]
    closed_s = rows[:, 1]
    # pack the closure bit into the sort key (open-first within each
    # label run — grouping ignores the bit): one payload fewer in the
    # sort, whose cost scales with operand count
    key = jnp.where(live & (plbl_s >= 0),
                    plbl_s * 2 + (1 - closed_s), 2 * n)
    skey2, sslot = lax.sort(
        (key, jnp.arange(S, dtype=jnp.int32)), num_keys=1)
    skey = skey2 >> 1
    sclosed = 1 - (skey2 & 1)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    last = jnp.concatenate([skey[1:] != skey[:-1], jnp.ones((1,), bool)])

    def run_total(vals):
        csum = jnp.cumsum(vals)
        pre = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])
        base = lax.cummax(jnp.where(first, pre, 0))
        big = jnp.iinfo(jnp.int32).max
        end = lax.cummin(jnp.where(last, csum, big), reverse=True)
        return end - base

    size = run_total(jnp.ones((S,), jnp.int32))
    n_open = run_total(1 - sclosed)
    killable = (skey < n) & (n_open == 0) & (size <= size_thre)
    keep = jnp.ones((S,), bool).at[sslot].set(~killable, mode="drop")
    return keep & live


def _polyline_tail_sparse(strings, sp: int, minerror: float,
                          size_thre: int, cap: int, cfg: PipelineConfig,
                          axis_name: str | None = None):
    """Slot-space polyline tail built on ONE walk (chain.arc_chain_sparse).

    On a post-removeBranch map every 8-connected component is a single
    path or cycle, so the strings CCL, count_ends/break_loops and the
    labelpl flood (label_arcs) are all derivable from the directed walk:
    the walk itself breaks cycles (min-visited root), and an arc is
    exactly {pixels of one chain with number >= 1}, whose labelpl id is
    the min flat index over those pixels (labelpl merges |dnum| <= 1
    8-neighbors, oclpolyline.cl:312-355 — along a chain consecutive
    pixels differ by exactly 1, and distinct chains are never 8-adjacent,
    so the partition is the chain partition minus heads).  Sizes, the
    size filter (filterSize, oclpolyline.cl:367-378) and the dense
    relabel (relabel_pass0/1, :380-420) then reduce over chain heads in
    slot space — no flood, no full-frame histogram.
    """
    from rectdetect_tpu.ops.chain import arc_chain_sparse
    from rectdetect_tpu.ops.compact import compact_mask, compact_subset

    h, w = strings.shape
    n = h * w
    comp0 = compact_mask((strings != 0).reshape(-1), sp)
    S = comp0.cap
    p_s = jnp.clip(comp0.idx, 0, n - 1)

    cyc_cap = max(1024, n // cfg.cycle_sparse_factor)

    def _walk_at(comp_w):
        Sw = comp_w.cap
        tail_cap = (max(4096, 2 * Sw // cfg.walk_tail_factor)
                    if cfg.walk_tail_factor else 0)
        tail_stages = None
        if tail_cap and cfg.walk_tail_factor2:
            cap2 = max(2048, 2 * Sw // cfg.walk_tail_factor2)
            if cap2 < tail_cap:
                tail_stages = ((cfg.walk_tail_rounds2, tail_cap),
                               (0, cap2))
        return arc_chain_sparse(
            strings, comp_w, cfg.number_doublings, cyc_cap, axis_name,
            tail_switch_rounds=cfg.walk_tail_switch, tail_cap=tail_cap,
            tail_stages=tail_stages, tail_pin=cfg.pin_walk_tail,
            cyc_pin=cfg.pin_cycle_walk)

    sp_arc = max(4096, n // cfg.arc_sparse_factor)
    sp_arc_small = (min(sp_arc, max(1024, n // cfg.arc_small_factor), cap)
                    if cfg.arc_small_factor else 0)

    def _arc_group(walk_out, comp_w):
        """Arc grouping IN THE WALK'S OWN SLOT SPACE (replaces
        label_arcs + calcSize + filterSize + relabel).  The walk reports
        the arc pixel count (chain length minus the head) and the
        labelpl arc id (min flat index over the arc) ELEMENTWISE per
        slot, so the per-head scatter histograms of the old formulation
        disappear entirely: the size filter and the root test are
        per-slot compares, and the dense relabel publishes ranks at root
        slots read back through one gather.  Running it over the walk's
        (possibly prefiltered) compaction rather than comp0 keeps every
        per-slot op at the survivor count and removes the (S, 5)
        back-scatter the round-3 formulation paid to unify spaces; the
        outputs below are (sp_arc,)-shaped, identical across the
        prefiltered/full walk branches (arc ids rank roots in flat
        order, the same order in either slot space).

        Returns (dense_a, number_a, comp_arc, n_arc): per-arc-slot
        dense arc id / number, the arc compaction at sp_arc, and the
        arc pixel count."""
        number_w, _, live_w, _, chainlen_w, arcmin_w = walk_out
        Sw = comp_w.cap
        p_w = jnp.clip(comp_w.idx, 0, n - 1)
        fgnum = live_w & (number_w > 0)
        keep = fgnum & (chainlen_w > size_thre)
        root_slot = comp_w.slot_of[jnp.clip(arcmin_w, 0, n)]
        rs_ok = root_slot < Sw          # root beyond comp cap: drop arc
        keep = keep & rs_ok
        is_root = keep & (p_w == arcmin_w)
        rank = jnp.cumsum(is_root.astype(jnp.int32))
        dense_w = jnp.where(
            keep, rank[jnp.clip(root_slot, 0, Sw - 1)], 0
        ).astype(jnp.int32)
        n_arc = jnp.sum((dense_w > 0).astype(jnp.int32))
        comp_arc = compact_subset(comp_w, dense_w > 0, sp_arc)
        slot_a = comp_w.slot_of[jnp.clip(comp_arc.idx, 0, n)]
        sa = jnp.clip(slot_a, 0, Sw - 1)
        # one (Sw, 2) packed row gather for both per-arc-slot values
        dn = jnp.stack([dense_w, number_w], axis=1)[sa]
        a_ok = comp_arc.valid()
        dense_a = jnp.where(a_ok, dn[:, 0], 0)
        number_a = jnp.where(a_ok, dn[:, 1], 0)
        return dense_a, number_a, comp_arc, n_arc

    S1 = (max(4096, n // cfg.walk_prefilter_factor)
          if cfg.walk_prefilter_factor else 0)
    if not S1 or S1 >= S or axis_name is not None:
        # sharded walks keep the plain path (the prefilter's pieces
        # flood would run per shard; the slot-range sharding already
        # divides the gather cost there)
        dense_a, number_a, comp_arc, n_arc = _arc_group(
            _walk_at(comp0), comp0)
    else:
        # small-component pre-kill (see _small_component_kill): the
        # walk AND the grouping run over the surviving slots only.
        # Runtime cond falls back to the unfiltered walk when survivors
        # overflow S1 (always exact); killed slots surface as number 0
        # (dead), exactly what the size filter would do to them.
        keep_s = _small_component_kill(strings, comp0, size_thre, cfg)
        rank1 = jnp.cumsum(keep_s.astype(jnp.int32)) - 1
        n_surv = jnp.where(S > 0, rank1[-1] + 1, 0)

        def filtered(_):
            comp1 = compact_subset(comp0, keep_s, S1)
            return _arc_group(_walk_at(comp1), comp1)

        def full(_):
            return _arc_group(_walk_at(comp0), comp0)

        if cfg.pin_walk_prefilter == 1:
            out = filtered(None)
        elif cfg.pin_walk_prefilter == 2:
            out = full(None)
        else:
            out = jax.lax.cond(n_surv <= S1, filtered, full, None)
        dense_a, number_a, comp_arc, n_arc = out

    def _mkpl_at(comp, dense_a2, number_a2, arena_cap: int):
        # materialize the dense/number images mkpl reads through
        # `comp`: only arc pixels are ever read, so scatter at the arc
        # slot count
        tgt_a = jnp.where(comp.valid(), jnp.clip(comp.idx, 0, n - 1), n)
        dense = jnp.zeros((n + 1,), jnp.int32).at[tgt_a].set(
            dense_a2, mode="drop")[:n].reshape(h, w)
        number = jnp.zeros((n + 1,), jnp.int32).at[tgt_a].set(
            number_a2, mode="drop")[:n].reshape(h, w)
        arena = mkpl_init(dense, number, arena_cap, comp)
        # TPU: the 15 subdivision iterations run in ONE VMEM megakernel
        # (ops/pallas_mkpl.py; the XLA form is ~6 latency-bound random
        # row ops per iteration).  Identical output; sharded/large-cap
        # configurations keep the XLA path.
        # arena_cap >= slot cap makes the in-kernel gn < cap backstop
        # provably dead (total segments <= slots), so the provisional
        # slot-order allocation + genealogy remap is a pure renaming
        if (cfg.mkpl_pallas and axis_name is None
                and comp.cap % 128 == 0 and comp.cap <= 16384
                and arena_cap >= comp.cap
                and jax.default_backend() == "tpu"):
            from rectdetect_tpu.ops.pallas_mkpl import mkpl_subdivide_pallas
            arena, lsid = mkpl_subdivide_pallas(
                arena, dense_a2, number_a2, comp, h, w, minerror,
                cfg.mkpl_iters)
        else:
            arena, lsid = mkpl_subdivide(arena, dense, number, minerror,
                                         cfg.mkpl_iters, comp, axis_name)
        arena = refine(arena, lsid, comp)
        return arena, lsid, comp

    if not sp_arc_small or sp_arc_small >= sp_arc:
        return _mkpl_at(comp_arc, dense_a, number_a, cap)

    # Runtime arc-capacity switch (same pattern as the strings switch in
    # polyline_execute): post-size-filter arc pixels measure ~0.3% of the
    # frame on noisy scenes, so mkpl/refine's per-iteration slot gathers,
    # arena scatters and cumsums — the dominant polyline table costs —
    # run at the small capacity whenever the arc pixels fit.  Equality of
    # the branches when n_arc < sp_arc_small: truncating the (flat-
    # ordered) arc compaction drops nothing, segment count is bounded by
    # arc pixels (chord spans >= 1 number index each, so leaves over an
    # L-px arc number <= L), hence neither branch's arena allocation
    # ever truncates and ids match.
    from rectdetect_tpu.ops.compact import Compaction

    def small(_):
        # shrink the sp_arc compaction to the small cap: slots are in
        # flat order, so the first sp_arc_small slots ARE the small
        # compaction when n_arc fits (and the deterministic
        # drop-highest-first overflow otherwise)
        comp_s = Compaction(
            idx=comp_arc.idx[:sp_arc_small],
            slot_of=jnp.minimum(comp_arc.slot_of,
                                sp_arc_small).astype(jnp.int32),
            n=jnp.minimum(comp_arc.n, sp_arc_small))
        arena, lsid, comp = _mkpl_at(comp_s, dense_a[:sp_arc_small],
                                     number_a[:sp_arc_small],
                                     sp_arc_small)
        pad_c = cap - sp_arc_small

        def padf(x):
            return jnp.concatenate([x, jnp.zeros((pad_c,), x.dtype)])

        arena = SegmentArena(
            sx=padf(arena.sx), sy=padf(arena.sy), ex=padf(arena.ex),
            ey=padf(arena.ey), start_index=padf(arena.start_index),
            end_index=padf(arena.end_index), left_ptr=padf(arena.left_ptr),
            right_ptr=padf(arena.right_ptr),
            start_count=padf(arena.start_count),
            end_count=padf(arena.end_count), polyid=padf(arena.polyid),
            npix=padf(arena.npix), level=padf(arena.level),
            count=arena.count)
        idx = jnp.concatenate(
            [comp.idx, jnp.full((sp_arc - sp_arc_small,), n, jnp.int32)])
        slot_of = jnp.where(comp.slot_of >= sp_arc_small, sp_arc,
                            comp.slot_of).astype(jnp.int32)
        return arena, lsid, Compaction(idx=idx, slot_of=slot_of, n=comp.n)

    def big(_):
        return _mkpl_at(comp_arc, dense_a, number_a, cap)

    if cfg.pin_arc_branch == 1:
        return small(None)
    if cfg.pin_arc_branch == 2:
        return big(None)
    return jax.lax.cond(n_arc < sp_arc_small, small, big, None)
