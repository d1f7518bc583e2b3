"""Pallas TPU megakernel for mkpl polyline subdivision.

The reference iterates mkpl_pass1/copy/pass2/pass3 N=16 times from the
host (oclpolyline.c:186-216; kernels oclpolyline.cl:509-646).  The XLA
formulation (ops/polyline.mkpl_subdivide) fuses each iteration's passes,
but its per-iteration segment reductions and arena updates are ~6 random
row gathers/scatters at slot/arena capacity — and at the calibrated
~4096-slot working set every such op costs a flat ~40 us of HBM access
latency regardless of row count, making the 15 sequential iterations
op-latency-bound (~3.9 ms measured at 720p, docs/SOL.md).

TPU re-design — *sorted-domain subdivision, one kernel launch*:

Slots are pre-sorted by (arc id, arc-length number).  Subdivision only
ever splits a segment at an interior pixel of its number range, so under
this order EVERY segment is a CONTIGUOUS RUN of slots across the whole
iteration sequence, and each iteration reduces to:

  * per-slot arena fields       -> segmented forward FILL from run heads
  * per-segment max deviation   -> segmented reduce-to-all (scan ladder
                                   forward + backward)
  * unique winner (min flat px) -> segmented arg-min of the flat index,
                                   payload-carrying ladder
  * pass2 split + update        -> elementwise at run heads; a split
                                   marks the winner slot as a new run
                                   head (pass3's pixel relabeling is
                                   IMPLICIT in run membership — equal to
                                   the reference's one-hop moves, which
                                   always complete within the iteration)
  * new-id ranks (by segment id, matching ops/polyline's deterministic
    allocation exactly)         -> masked pairwise id compares chunked
                                   over rows — S^2/lane VPU ops, no
                                   gather

All ladders are Hillis-Steele chains of flat shifts over the (S/128,
128) VMEM layout — pure VPU rolls and selects, zero HBM traffic inside
the 15-iteration loop.  The entire loop runs in ONE pallas_call; the
only HBM costs are the one-time sort, the init-record gather and the
final arena scatter (mkpl_subdivide_pallas below).

Output parity: identical arena (same ids, same fields) and lsid map as
mkpl_subdivide for any input (the allocation rule, winner tie-break —
min flat pixel index — and all split tests replicate
ops/polyline.mkpl_subdivide's f32 sequence).  The XLA path remains the
oracle (tests/test_pallas_mkpl.py) and the fallback for sharded
(axis_name) and large-capacity configurations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rectdetect_tpu.ops import vmem

FIX = 65536.0          # fixed-point distance scale (oclpolyline.cl:535)
MINEDGELEN = 1.0       # oclpolyline.cl:20
MINNINDEX = 4          # oclpolyline.cl:21

_LANES = 128
_BIG = 2 ** 30


def _mkpl_kernel(p_ref, num_ref, arcst_ref, rec_ref, cnt_ref,
                 out_ref, cnt_out_ref, *, S: int, cap: int,
                 minerr_fix: int, n_iters: int, w: int):
    """All n_iters-1 subdivision iterations over VMEM-resident state.

    Layout: R = S/128 rows x 128 lanes, slot-major (flat slot i lives at
    [i // 128, i % 128]).

    Inputs:
      p_ref:     (R,128) i32 flat pixel index per sorted slot; h*w = dead
      num_ref:   (R,128) i32 arc-length number per slot
      arcst_ref: (R,128) i32 1 at the first slot of each arc (and at
                 every dead/padding slot, which isolates them)
      rec_ref:   (12, R, 128) i32 initial run records at arc-head slots
                 [sx, sy, ex, ey (f32 bits), sidx, eidx, scount, ecount,
                  polyid, segid, level, npix]
      cnt_ref:   (1, 1) SMEM i32 initial segment count
    Outputs:
      out_ref:     (16, R, 128) i32 final [12 run records, seg_start,
                   lsid per slot, right_segid, left_segid]
      cnt_out_ref: (1, 1) i32 final count
    """
    R = S // _LANES
    rr = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    gidx = rr * _LANES + cc
    big = jnp.int32(_BIG)

    def _f(x):
        return jax.lax.bitcast_convert_type(x, jnp.float32)

    def _i(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def shift_fwd(a, d: int, fill):
        """a_flat[i - d] (row-major), `fill` (scalar or array) for i<d."""
        q, s = divmod(d, _LANES)
        ar = jnp.roll(a, q, 0) if q else a
        if s:
            within = jnp.roll(ar, s, 1)
            prev = jnp.roll(jnp.roll(a, q + 1, 0), s, 1)
            out = jnp.where(cc >= s, within, prev)
        else:
            out = ar
        return jnp.where(gidx >= d, out, fill)

    def shift_bwd(a, d: int, fill):
        """a_flat[i + d], `fill` for i >= S - d."""
        q, s = divmod(d, _LANES)
        ar = jnp.roll(a, -q, 0) if q else a
        if s:
            within = jnp.roll(ar, -s, 1)
            nxt = jnp.roll(jnp.roll(a, -(q + 1), 0), -s, 1)
            out = jnp.where(cc < _LANES - s, within, nxt)
        else:
            out = ar
        return jnp.where(gidx < S - d, out, fill)

    def ladder(vals, bound, shift, better):
        """Generic segmented Hillis-Steele ladder.

        vals[0] is the selection key; all channels move together when
        `better(cand_key, cur_key)`.  `bound` (i32) marks positions
        whose window must not extend past them (segment heads for a
        forward ladder, segment lasts for a backward one); `shift` is
        shift_fwd or shift_bwd.  After log2(S) steps every slot holds
        the best element of its whole segment on that side; composing
        forward then backward yields the full-segment reduction.
        """
        f = bound
        d = 1
        while d < S:
            f_sh = shift(f, d, jnp.int32(1))
            cand = [shift(v, d, v) for v in vals]
            take = (f == 0) & better(cand[0], vals[0])
            vals = [jnp.where(take, c, v) for c, v in zip(cand, vals)]
            f = f | f_sh
            d *= 2
        return vals

    def seg_fill_fwd(vals, head):
        """Each slot takes the channel values of its nearest head <= it
        (fill: key channel is the head flag itself via `better`)."""
        f = head
        d = 1
        while d < S:
            f_sh = shift_fwd(f, d, jnp.int32(1))
            take = f == 0
            vals = [jnp.where(take, shift_fwd(v, d, v), v) for v in vals]
            f = f | f_sh
            d *= 2
        return vals

    def seg_fill_bwd(vals, last):
        f = last
        d = 1
        while d < S:
            f_sh = shift_bwd(f, d, jnp.int32(1))
            take = f == 0
            vals = [jnp.where(take, shift_bwd(v, d, v), v) for v in vals]
            f = f | f_sh
            d *= 2
        return vals

    def seg_reduce_all(vals, head, last, better):
        """Full-segment payload-carrying reduction to every slot."""
        vals = ladder(vals, head, shift_fwd, better)
        return ladder(vals, last, shift_bwd, better)

    def prefix_sum(v):
        """Plain (unsegmented) inclusive prefix sum over flat order."""
        d = 1
        while d < S:
            v = v + shift_fwd(v, d, jnp.int32(0))
            d *= 2
        return v

    p = p_ref[:]
    num = num_ref[:]
    arc_start = arcst_ref[:]
    pxf = (p % w).astype(jnp.float32)
    pyf = (p // w).astype(jnp.float32)
    numf = num.astype(jnp.float32)

    # Genealogy keys (see mkpl_subdivide_pallas): 4 x 30-bit words of
    # 5-bit groups, lexicographically ordered like the XLA path's final
    # segment ids.  An initial arc's key is its id in the top word
    # (group code 0 = "arc" sorts before every split code 16+t).
    k0_init = rec_ref[9][:] << 12
    zeros = jnp.zeros((R, _LANES), jnp.int32)
    state = (
        _f(rec_ref[0]), _f(rec_ref[1]), _f(rec_ref[2]), _f(rec_ref[3]),
        rec_ref[4][:], rec_ref[5][:], rec_ref[6][:], rec_ref[7][:],
        rec_ref[8][:], rec_ref[9][:], rec_ref[10][:], rec_ref[11][:],
        arc_start, cnt_ref[0, 0], k0_init, zeros, zeros, zeros)

    def body(it, state):
        (sx, sy, ex, ey, sidx, eidx, scount, ecount, polyid, segid,
         level, npix, seg_start, count, k0, k1, k2, k3) = state
        last = shift_bwd(seg_start, 1, jnp.int32(1))

        # per-slot segment fields (the arena row gather of the XLA path)
        fsx, fsy, fex, fey, fpoly = seg_fill_fwd(
            [sx, sy, ex, ey, polyid], seg_start)
        live_px = fpoly != 0

        # pass1: fixed-point distance to the current chord
        # (closestPoint, oclpolyline.cl:51-59) — the f32 sequence of
        # polyline._closest_point_dist
        dx = fex - fsx
        dy = fey - fsy
        l2 = dx * dx + dy * dy
        t = jnp.where(l2 > 1e-4,
                      ((pxf - fsx) * dx + (pyf - fsy) * dy) /
                      jnp.maximum(l2, 1e-4), 0.0)
        t = jnp.clip(t, 0.0, 1.0)
        clx = fsx + t * dx - pxf
        cly = fsy + t * dy - pyf
        dd = jnp.hypot(clx, cly)     # the XLA path's exact f32 sequence
        dist = (dd * FIX).astype(jnp.int32)
        dist = jnp.where(live_px, dist, -1)

        # segment max deviation, broadcast to every slot
        (mx,) = seg_reduce_all([dist], seg_start, last,
                               lambda c, v: c > v)
        # winner: min flat pixel index achieving the max (the XLA
        # path's min-slot == min-flat-index tie-break), with payloads
        at_max = live_px & (dist == mx) & (mx >= 0)
        wkey = jnp.where(at_max, p, big)
        wk, wx, wy, wn = seg_reduce_all(
            [wkey, pxf, pyf, numf], seg_start, last,
            lambda c, v: c < v)
        has_w = wk < big
        wni = wn.astype(jnp.int32)

        # pass2 split conditions at run heads (oclpolyline.cl:564-577),
        # matching polyline.mkpl_subdivide term for term
        mdf = mx.astype(jnp.float32)
        chord_sq = (ex - sx) ** 2 + (ey - sy) ** 2
        curv_keep = ~((mx < minerr_fix * 3) &
                      (mdf * mdf / jnp.maximum(chord_sq, 1e-30)
                       < 100000.0))
        dss = (wx - sx) ** 2 + (wy - sy) ** 2
        dse = (wx - ex) ** 2 + (wy - ey) ** 2
        split = ((seg_start != 0) & (polyid != 0) & has_w
                 & (eidx - sidx >= MINNINDEX - 1)
                 & (scount <= 1) & (ecount <= 1)
                 & (mx >= minerr_fix) & curv_keep
                 & (dss >= MINEDGELEN * MINEDGELEN)
                 & (dse >= MINEDGELEN * MINEDGELEN))

        # PROVISIONAL allocation in slot order (a plain prefix-sum
        # ladder); the caller remaps to the XLA path's exact id order
        # post-kernel via the genealogy keys.  The callers gate this
        # kernel to arena_cap >= S, where total segments <= slots means
        # gn < cap can never trip — kept as a deterministic backstop
        # (it then drops the same all-or-none set as the XLA path).
        rank = prefix_sum(jnp.where(split, 1, 0))
        gn = count + rank                         # rank is 1-based
        split = split & (gn < cap)
        new_count = count + jnp.sum(jnp.where(split, 1, 0))

        # child genealogy key = push(16 + t, parent key): 5-bit group
        # shift-down across the 30-bit words
        code = jnp.int32(16) + it + 1
        c0 = (code << 25) | (k0 >> 5)
        c1 = ((k0 & 31) << 25) | (k1 >> 5)
        c2 = ((k1 & 31) << 25) | (k2 >> 5)
        c3 = ((k2 & 31) << 25) | (k3 >> 5)

        # winner slot learns its run's decision/new record pieces
        (fspl, fgn, fexb, feyb, feidx, flev,
         fc0, fc1, fc2, fc3) = seg_fill_fwd(
            [split.astype(jnp.int32), gn, _i(ex), _i(ey), eidx, mx,
             c0, c1, c2, c3], seg_start)
        is_winner = (fspl != 0) & (p == wk) & at_max & (seg_start == 0)
        # (the winner can never be the run head: dss >= MINEDGELEN^2
        # excludes the start pixel, so seg_start==0 there already —
        # the guard is belt-and-suspenders)

        # old run head: end moves to the winner (oclpolyline.cl:598-615)
        upd = split
        ex_n = jnp.where(upd, wx, ex)
        ey_n = jnp.where(upd, wy, ey)
        eidx_n = jnp.where(upd, wni, eidx)

        # new run record materializes at the winner slot
        sx_n = jnp.where(is_winner, wx, sx)
        sy_n = jnp.where(is_winner, wy, sy)
        ex_n = jnp.where(is_winner, _f(fexb), ex_n)
        ey_n = jnp.where(is_winner, _f(feyb), ey_n)
        sidx_n = jnp.where(is_winner, wni, sidx)
        eidx_n = jnp.where(is_winner, feidx, eidx_n)
        sc_n = jnp.where(is_winner, 0, scount)
        ec_n = jnp.where(is_winner, 0, ecount)
        poly_n = jnp.where(is_winner, fpoly, polyid)
        segid_n = jnp.where(is_winner, fgn, segid)
        level_n = jnp.where(is_winner, flev, level)
        npix_n = jnp.where(is_winner, 0, npix)
        seg_start_n = seg_start | is_winner.astype(jnp.int32)
        k0_n = jnp.where(is_winner, fc0, k0)
        k1_n = jnp.where(is_winner, fc1, k1)
        k2_n = jnp.where(is_winner, fc2, k2)
        k3_n = jnp.where(is_winner, fc3, k3)

        return (sx_n, sy_n, ex_n, ey_n, sidx_n, eidx_n, sc_n, ec_n,
                poly_n, segid_n, level_n, npix_n, seg_start_n,
                new_count, k0_n, k1_n, k2_n, k3_n)

    state = jax.lax.fori_loop(0, n_iters - 1, body, state)
    (sx, sy, ex, ey, sidx, eidx, scount, ecount, polyid, segid, level,
     npix, seg_start, count, k0, k1, k2, k3) = state

    # per-slot lsid.  pass3 moves only pixels with num STRICTLY past the
    # split (oclpolyline.cl:618-646), so a split pixel (num == its run's
    # start_index) keeps the PARENT segment's label: every non-arc-head
    # run head reports the previous run's id (the slot before a head
    # always belongs to the previous run of the same arc).
    (lsid,) = seg_fill_fwd([segid], seg_start)
    prev_lsid = shift_fwd(lsid, 1, jnp.int32(0))
    lsid = jnp.where((seg_start != 0) & (arc_start == 0), prev_lsid,
                     lsid)

    # chain pointers: right = segid of the next run head in the SAME
    # arc (else 0), left analogous.  Arc membership via the arc head's
    # global slot position (constant), filled to every slot.
    (arc_of,) = seg_fill_fwd([jnp.where(arc_start != 0, gidx, 0)],
                             arc_start)
    head_sid = jnp.where(seg_start != 0, segid, big)
    head_arc = jnp.where(seg_start != 0, arc_of, -1)
    last_flag = shift_bwd(seg_start, 1, jnp.int32(1))
    nxt_sid, nxt_arc = seg_fill_bwd(
        [shift_bwd(head_sid, 1, big), shift_bwd(head_arc, 1, -1)],
        last_flag)
    right = jnp.where((seg_start != 0) & (nxt_sid < big) &
                      (nxt_arc == arc_of), nxt_sid, 0)
    prv_sid, prv_arc = seg_fill_fwd(
        [shift_fwd(head_sid, 1, big), shift_fwd(head_arc, 1, -1)],
        shift_fwd(seg_start, 1, jnp.int32(1)))
    left = jnp.where((seg_start != 0) & (prv_sid < big) &
                     (prv_arc == arc_of), prv_sid, 0)

    out_ref[0] = _i(sx)
    out_ref[1] = _i(sy)
    out_ref[2] = _i(ex)
    out_ref[3] = _i(ey)
    out_ref[4] = sidx
    out_ref[5] = eidx
    out_ref[6] = scount
    out_ref[7] = ecount
    out_ref[8] = polyid
    out_ref[9] = segid
    out_ref[10] = level
    out_ref[11] = npix
    out_ref[12] = seg_start
    out_ref[13] = lsid
    out_ref[14] = right
    out_ref[15] = left
    out_ref[16] = k0
    out_ref[17] = k1
    out_ref[18] = k2
    out_ref[19] = k3
    cnt_out_ref[0, 0] = count


def _f32bits(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)


def _ibits(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def mkpl_subdivide_pallas(arena, dense_a, number_a, comp, h: int,
                          w: int, minerror: float, n_iters: int,
                          interpret: bool = False):
    """mkpl_subdivide via the sorted-domain megakernel (see module
    docstring).  Returns (arena2, lsid_image) exactly like
    polyline.mkpl_subdivide(arena, dense_img, number_img, minerror,
    n_iters, comp), where dense_a/number_a are the per-comp-slot arc
    id / number values (the images' values at comp pixels).

    HBM work: one 2-key sort of the slots, one (S,12) init-record
    gather, the kernel, one (cap,13) bitcast-packed arena row scatter
    and the lsid image scatter — everything per-iteration lives in
    VMEM."""
    n = h * w
    cap = arena.cap
    S = comp.cap
    assert S % _LANES == 0, S
    # arena_cap >= slot cap: total segments <= slots, so the arena can
    # never overflow and the provisional slot-order allocation + the
    # genealogy remap is a pure renaming of the XLA path's ids.  (Under
    # overflow the two paths would drop DIFFERENT split sets; callers
    # with smaller arenas must use the XLA path.)
    assert cap >= S, (cap, S)
    R = S // _LANES

    live = comp.valid() & (dense_a > 0)
    p_s = jnp.where(live, jnp.clip(comp.idx, 0, n - 1), n)
    key_arc = jnp.where(live, dense_a, _BIG)
    # 2-key lexicographic sort (arc, number) carrying the pixel index;
    # arc and number come back as the keys themselves
    karc, num_srt, p_srt = jax.lax.sort(
        (key_arc, number_a, p_s), num_keys=2)
    live_srt = karc < _BIG
    arc_srt = jnp.where(live_srt, karc, 0)

    arc_prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                karc[:-1]])
    arc_start = (live_srt & (karc != arc_prev)).astype(jnp.int32)
    # dead/padding slots: isolate each as its own (inert) run
    arc_start = jnp.where(live_srt, arc_start, 1)
    arc_srt = jnp.where(live_srt, arc_srt, 0)

    # initial run records at arc heads, gathered from the init arena
    ids = jnp.arange(cap, dtype=jnp.int32)
    rec_tab = jnp.stack(
        [_f32bits(arena.sx), _f32bits(arena.sy), _f32bits(arena.ex),
         _f32bits(arena.ey), arena.start_index, arena.end_index,
         arena.start_count, arena.end_count, arena.polyid, ids,
         arena.level, arena.npix], axis=1)             # (cap, 12)
    aid = jnp.clip(arc_srt, 0, cap - 1)
    recs = jnp.where((arc_start != 0)[:, None] &
                     (arc_srt > 0)[:, None] & (arc_srt < cap)[:, None],
                     rec_tab[aid], 0)                  # (S, 12)
    # arcs with id >= cap (pinned-overflow inputs) keep polyid 0 =>
    # never split; their slots keep lsid = segid = arc id
    recs = jnp.where(((arc_start != 0) & (arc_srt >= cap))[:, None],
                     jnp.stack([jnp.zeros_like(arc_srt)] * 9 +
                               [arc_srt] + [jnp.zeros_like(arc_srt)] * 2,
                               axis=1), recs)

    kern = functools.partial(
        _mkpl_kernel, S=S, cap=cap,
        minerr_fix=int(minerror * FIX), n_iters=n_iters, w=w)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out, cnt = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((20, R, _LANES), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        in_specs=[vspec, vspec, vspec, vspec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vspec, pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
        compiler_params=None if interpret else vmem.compiler_params(),
    )(p_srt.reshape(R, _LANES), num_srt.reshape(R, _LANES),
      arc_start.reshape(R, _LANES),
      recs.T.reshape(12, R, _LANES),
      arena.count.reshape(1, 1))

    flat = out.reshape(20, S)
    seg_start = flat[12]
    segid_out = flat[9]
    run = (seg_start != 0) & live_srt & (segid_out > 0) & \
        (segid_out < cap)

    # Remap the kernel's provisional (slot-order) ids to the XLA path's
    # exact ids: new segments sort by genealogy key — lexicographically
    # identical to "blocks by creation iteration, within a block by
    # parent id", which is exactly the XLA allocation order — and take
    # ids count0+1.. in that order.
    count0 = arena.count
    is_new = run & (segid_out > count0)
    sent = jnp.int32(2 ** 30)
    sk0 = jnp.where(is_new, flat[16], sent)
    s0, s1, s2, s3, s_prov = jax.lax.sort(
        (sk0, flat[17], flat[18], flat[19], segid_out), num_keys=4)
    svalid = s0 < sent
    table = jnp.arange(cap + 1, dtype=jnp.int32)
    table = table.at[jnp.where(svalid, jnp.clip(s_prov, 0, cap - 1),
                               cap)].set(
        count0 + 1 + jnp.arange(S, dtype=jnp.int32), mode="drop")
    segid_f = table[jnp.clip(segid_out, 0, cap - 1)]
    right_f = table[jnp.clip(flat[14], 0, cap - 1)]
    left_f = table[jnp.clip(flat[15], 0, cap - 1)]
    # lsid values >= cap (pinned-overflow arcs keep their out-of-range
    # dense id, never subdivided) pass through unmapped, as in the XLA
    # path
    lsid_f = jnp.where(flat[13] < cap,
                       table[jnp.clip(flat[13], 0, cap - 1)], flat[13])
    tgt = jnp.where(run, segid_f, cap)

    # ONE bitcast-packed row scatter updates all arena fields
    upd = jnp.stack(
        [flat[0], flat[1], flat[2], flat[3], flat[4], flat[5],
         left_f, right_f, flat[8], flat[10], flat[11], flat[6],
         flat[7]], axis=1)                              # (S, 13)
    base = jnp.stack(
        [_f32bits(arena.sx), _f32bits(arena.sy), _f32bits(arena.ex),
         _f32bits(arena.ey), arena.start_index, arena.end_index,
         arena.left_ptr, arena.right_ptr, arena.polyid, arena.level,
         arena.npix, arena.start_count, arena.end_count], axis=1)
    merged = jnp.concatenate(
        [base, jnp.zeros((1, 13), jnp.int32)]).at[tgt].set(
        upd, mode="drop")[:cap]
    arena2 = arena._replace(
        sx=_ibits(merged[:, 0]), sy=_ibits(merged[:, 1]),
        ex=_ibits(merged[:, 2]), ey=_ibits(merged[:, 3]),
        start_index=merged[:, 4], end_index=merged[:, 5],
        left_ptr=merged[:, 6], right_ptr=merged[:, 7],
        polyid=merged[:, 8], level=merged[:, 9], npix=merged[:, 10],
        start_count=merged[:, 11], end_count=merged[:, 12],
        count=cnt[0, 0])

    lsid_img = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(live_srt, p_srt, n)].set(
        lsid_f, mode="drop")[:n].reshape(h, w)
    return arena2, lsid_img
