"""Chain traversal: per-pixel neighbors along pixel strings and arc-length
numbering.

The reference walks 8-connected pixel strings with per-pixel next/prev
pointers plus a direction-reversal flag algebra, advanced by fixed-hop
kernels (findEnds0/1/2 + number, oclpolyline.cl:169-310; host sequence
oclpolyline.c:250-275: 4 x 8-hop passes then 3 x 32-hop passes, reaching
chains of ~4096/32768 px).

TPU re-design — *directed-edge pointer doubling*:

Every pixel p on a string (all degrees <= 2 after removeBranch) has up to
two same-label neighbors n0(p), n1(p), enumerated in the reference's fixed
rx/ry scan order (oclpolyline.cl:63-64, getnp :169-191).  Define 2N walker
states u = (k, p) = "standing at p, about to step to nk(p)":

    q = nk(p);  if q == p the state is absorbing (p is a chain end);
    otherwise the walk continues at q away from p:
    succ(u) = (k', q) with k' = 1 if n0(q) == p else 0.

Pointer doubling on succ with hop-count accumulation yields, for every
pixel and direction, the absorbing chain end and the exact distance to it
in ceil(log2(maxlen)) gather passes — the same result as the reference's
flag algebra but with exponential (not linear-per-pass) reach and no
atomics.  The canonical head of a chain is its end with the smaller flat
index (findEnds2, oclpolyline.cl:269-285); number(p) = arc distance from
the head (the head itself gets 0, matching the reference, whose head is
then dropped by labelpl_preprocess treating number==0 as background).

Components that are cycles never absorb; breakLoops (oclpolyline.cl:157-167)
deletes one pixel of every endpoint-free component beforehand, exactly so
this cannot happen.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from rectdetect_tpu.ops.shifts import NEIGH8_REF, pad2d, shifted


def _doubling_rows(packed, ptr, axis_name):
    """One pointer-doubling gather `packed[ptr]`, optionally sharded by
    slot range over a mesh axis: each device gathers its contiguous slice
    of states and an all_gather reassembles the (replicated) table.  The
    walk state stays identical on every device (integer ops on identical
    inputs), so this divides the dominant random-gather cost by the axis
    size at the price of one all_gather of the table per doubling —
    cheap on ICI relative to DRAM-latency-bound row gathers (docs/SOL.md
    random-row constant)."""
    if axis_name is None:
        return packed[ptr]
    m = ptr.shape[0]
    n_sh = lax.axis_size(axis_name)
    chunk = -(-m // n_sh)
    pad = n_sh * chunk - m
    ptr_p = jnp.concatenate(
        [ptr, jnp.zeros((pad,), ptr.dtype)]) if pad else ptr
    local = lax.dynamic_slice_in_dim(
        ptr_p, lax.axis_index(axis_name) * chunk, chunk)
    rows = lax.all_gather(packed[local], axis_name, axis=0, tiled=True)
    return rows[:m]


def chain_neighbors(label):
    """First/second same-label neighbor of every pixel, as flat indices.

    label: (H, W) int32 with -1 for background (CCL output).  Border pixels
    and background get n0 = n1 = self, like getnp returning p0.
    Returns (n0, n1): (H*W,) int32 each.
    """
    h, w = label.shape
    idx2d = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lblp = pad2d(label, 1, "zero", constant=-2)  # border sentinel != any label
    fg = label >= 0
    # Interior guard: the reference only runs on 1..size-2 (findEnds0
    # oclpolyline.cl:200); border foreground pixels behave as isolated.
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    active = fg & interior

    n0 = idx2d
    n1 = idx2d
    found0 = jnp.zeros((h, w), bool)
    found1 = jnp.zeros((h, w), bool)
    for dy, dx in NEIGH8_REF:
        same = shifted(lblp, 1, dy, dx, h, w) == label
        nbidx = idx2d + dy * w + dx
        take0 = same & ~found0
        take1 = same & found0 & ~found1
        n0 = jnp.where(take0, nbidx, n0)
        n1 = jnp.where(take1, nbidx, n1)
        found1 = found1 | take1
        found0 = found0 | same
    n0 = jnp.where(active, n0, idx2d)
    n1 = jnp.where(active, n1, idx2d)
    return n0.reshape(-1), n1.reshape(-1)


def arc_number(label, n_doublings: int = 15, sparse_cap: int | None = None,
               comp=None):
    """Arc-length index of every string pixel from its canonical head.

    label: (H, W) int32 CCL labels (-1 background) of a string image whose
    pixels all have degree <= 2 (post removeBranch + breakLoops).
    Returns (number, end0, end1):
      number: (H, W) int32, 0 at heads/background, k at the k-th pixel
              along the chain from the head (head = chain end with the
              smaller flat index), matching the reference's number output
              (oclpolyline.cl:287-310).
      end0/end1: (H*W,) int32 flat indices of the two chain ends reached
              from each pixel (used by tests; head = min of the two).
    """
    h, w = label.shape
    n = h * w
    n0, n1 = chain_neighbors(label)

    if comp is not None:
        return _arc_number_sparse(label, n0, n1, n_doublings, comp.cap,
                                  comp)
    if sparse_cap is not None:
        return _arc_number_sparse(label, n0, n1, n_doublings, sparse_cap)

    idx = jnp.arange(n, dtype=jnp.int32)

    # Directed states u = k*n + p ("at p, stepping into nk(p)").
    nk = jnp.concatenate([n0, n1])              # (2n,) target pixel q
    p_of = jnp.concatenate([idx, idx])
    absorbing = nk == p_of
    q = nk
    # Next direction at q, walking away from p: 1 if n0(q) == p else 0.
    kprime = jnp.where(n0[q] == p_of, 1, 0).astype(jnp.int32)
    ptr = jnp.where(absorbing, jnp.concatenate([idx, idx + n]),
                    kprime * n + q)
    dist = jnp.where(absorbing, 0, 1).astype(jnp.int32)

    for _ in range(n_doublings):
        packed = jnp.stack([dist, ptr], axis=1)   # fused row gather
        rows = packed[ptr]
        dist = dist + rows[:, 0]
        ptr = rows[:, 1]

    # States on residual cycles (a breakLoops root whose removal left a
    # diagonal reconnection) never absorb.  The reference's fixed-hop walks
    # produce scheduling-dependent garbage there, which downstream stages
    # drop (no number==1 pixel -> polyid 0, oclpolyline.cl:497-504).  Here
    # they deterministically get number 0 (dropped as background by
    # label_arcs), same outcome.
    absorbed = absorbing[ptr]
    endpix = ptr % n                             # absorbing state's pixel
    e0, d0, a0 = endpix[:n], dist[:n], absorbed[:n]
    e1, d1, a1 = endpix[n:], dist[n:], absorbed[n:]
    pick0 = e0 <= e1
    number = jnp.where(pick0, d0, d1)
    okdir = jnp.where(pick0, a0, a1)
    fg = label.reshape(-1) >= 0
    number = jnp.where(fg & okdir, number, 0)
    return number.reshape(h, w).astype(jnp.int32), e0, e1


def _arc_number_sparse(label, n0, n1, n_doublings: int, cap: int,
                       comp=None):
    """arc_number's pointer doubling over a compacted foreground slot list:
    states live in slot space (2*cap instead of 2*H*W), so every doubling
    gather costs O(edge pixels).  Identical output to the dense path.

    comp: optional pre-built Compaction of a SUPERSET of the labeled
    pixels (the polyline pipeline shares one strings compaction across
    its table ops — each full-frame prefix-sum/scatter costs ~as much as
    all the slot-space work it enables); slots whose pixel has been
    unlabeled since (break_loops) are treated as absorbing background."""
    from rectdetect_tpu.ops.compact import compact_mask

    h, w = label.shape
    n = h * w
    fg = label.reshape(-1) >= 0
    if comp is None:
        comp = compact_mask(fg, cap)
        live = comp.valid()
    else:
        live = comp.valid() & fg[jnp.clip(comp.idx, 0, n - 1)]
    p_s = jnp.clip(comp.idx, 0, n - 1)           # (S,) pixel per slot

    n0_s = n0[p_s]
    n1_s = n1[p_s]
    nk = jnp.concatenate([n0_s, n1_s])           # (2S,) target pixel
    p_rep = jnp.concatenate([p_s, p_s])
    live2 = jnp.concatenate([live, live])
    absorbing = (nk == p_rep) | ~live2

    q_slot = comp.slot_of[jnp.clip(nk, 0, n)]    # slot of the target pixel
    # targets are same-label fg pixels; an out-of-capacity slot (overflow)
    # degrades to absorbing rather than corrupting memory
    q_ok = q_slot < cap
    q_slot = jnp.clip(q_slot, 0, cap - 1)
    absorbing = absorbing | ~q_ok

    n0_at_q = n0_s[q_slot]
    kprime = jnp.where(n0_at_q == p_rep, 1, 0).astype(jnp.int32)
    self_state = jnp.arange(2 * cap, dtype=jnp.int32)
    ptr = jnp.where(absorbing, self_state, kprime * cap + q_slot)
    dist = jnp.where(absorbing, 0, 1).astype(jnp.int32)
    absorb0 = absorbing

    for _ in range(n_doublings):
        packed = jnp.stack([dist, ptr], axis=1)   # fused row gather
        rows = packed[ptr]
        dist = dist + rows[:, 0]
        ptr = rows[:, 1]

    absorbed = absorb0[ptr]
    endpix = p_rep[ptr]
    e0, d0, a0 = endpix[:cap], dist[:cap], absorbed[:cap]
    e1, d1, a1 = endpix[cap:], dist[cap:], absorbed[cap:]
    pick0 = e0 <= e1
    num_s = jnp.where(pick0, d0, d1)
    okdir = jnp.where(pick0, a0, a1)
    num_s = jnp.where(live & okdir, num_s, 0)

    number = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(live, p_s, n)].set(num_s, mode="drop")[:n]
    # e0/e1 in pixel space for API parity with the dense path
    e0_full = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(live, p_s, n)].set(e0, mode="drop")[:n]
    e1_full = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(live, p_s, n)].set(e1, mode="drop")[:n]
    return number.reshape(h, w), e0_full, e1_full


def arc_chain_sparse(strings, comp, n_doublings: int, cyc_cap: int,
                     axis_name: str | None = None,
                     tail_switch_rounds: int = 6,
                     tail_cap: int = 0,
                     tail_stages=None,
                     tail_pin: int = 0,
                     cyc_pin: int = 0):
    """Arc-length numbering with built-in loop breaking, in one walk.

    Replaces the polyline pipeline's strings-CCL -> count_ends ->
    break_loops -> arc_number chain (and feeds the label_arcs-free arc
    grouping, see polyline._polyline_tail): on a degree<=2 string map
    (post removeBranch, oclpolyline.cl:126-147) two 8-adjacent foreground
    pixels are same-component by definition, so the directed walk of
    arc_number needs no CCL labels.  Components whose walks never absorb
    are cycles; their canonical root (the min flat index — the same pixel
    breakLoops kills, since labelxPreprocess roots are component minima,
    oclpolyline.cl:157-167) is recovered by folding a min-visited-index
    accumulator into the pointer doubling, and each cycle is re-numbered
    by a second doubling over the (few) cycle slots only, with steps into
    the root absorbing — the walk semantics of the root being deleted.

    Documented deviations (docs/STATUS.md):
      * cycles touching the image border absorb at the border pixel
        (border pixels walk as isolated) instead of being split at the
        component root — same pixels, the single arc is cut at a
        different point;
      * isolated pixels stay on the edge map (they produce no arc either
        way, number stays 0);
      * chains longer than 2^n_doublings px degrade to deterministic
        partial numbering (the reference degrades identically past its
        fixed-hop reach, oclpolyline.cl:287-310).

    Returns (number_s, head_s, live, cyc) over comp slots:
      number_s: (S,) int32 arc index (0 at heads/cycle roots/background)
      head_s:   (S,) int32 flat pixel index of the chain head (valid
                where number_s > 0)
      live:     (S,) bool slot validity
      cyc:      (S,) bool pixel sits on a cycle (calibration signal for
                cycle_sparse_factor)

    axis_name: shard the main walk's doubling gathers by slot range over
    this mesh axis (see _doubling_rows); the tiny cycle re-walk stays
    replicated.  Output is identical (and replicated) either way.

    tail_switch_rounds/tail_cap: after 2^tail_switch_rounds reach, the
    surviving (non-fixpoint) walk states are compacted into a
    tail_cap-slot sub-list and the remaining doublings run there —
    the dominant random-gather cost drops from 2S rows to ~3*tail_cap
    rows per round (phase-2 comment below).  tail_cap=0 disables
    (every round over the full table).  The phase-2 gathers are always
    replicated; axis_name shards phase 1 only.

    tail_stages: optional tuple of (rounds, cap) stages overriding the
    single (n_doublings - tail_switch_rounds, tail_cap) stage: after
    each stage's rounds, the sub-list state is written back to the full
    table and the still-unconverged states are re-compacted to the next
    (smaller) cap — exponentially fewer states survive each extra reach
    doubling, so later rounds run over far shorter lists.  Each stage's
    engage test falls back to running that stage at the previous
    capacity when its survivors don't fit (always exact).
    """
    h, w = strings.shape
    n = h * w
    lbl01 = jnp.where(strings != 0, 0, -1).astype(jnp.int32)
    n0, n1 = chain_neighbors(lbl01)

    S = comp.cap
    live = comp.valid()
    p_s = jnp.clip(comp.idx, 0, n - 1)
    # one (S,2) row gather for both neighbor maps (random-row gathers
    # cost per ROW, not per element — docs/SOL.md)
    n01_s = jnp.stack([n0, n1], axis=1)[p_s]
    n0_s = n01_s[:, 0]
    n1_s = n01_s[:, 1]

    # ---- pass A: full walk with min-visited accumulation ----------------
    nk = jnp.concatenate([n0_s, n1_s])            # (2S,) target pixel
    p_rep = jnp.concatenate([p_s, p_s])
    live2 = jnp.concatenate([live, live])
    absorbing = (nk == p_rep) | ~live2
    # fused target-pixel table: slot, n0, n1 of the target in ONE row
    # gather (n0[target] == n0_s[q_slot] whenever the slot is valid)
    ftab = jnp.stack([comp.slot_of,
                      jnp.append(n0, jnp.int32(n)),
                      jnp.append(n1, jnp.int32(n))], axis=1)
    rows_t = ftab[jnp.clip(nk, 0, n)]             # (2S,3)
    q_ok = rows_t[:, 0] < S
    q_slot = jnp.clip(rows_t[:, 0], 0, S - 1)
    absorbing = absorbing | ~q_ok                 # comp overflow: absorb
    kprime = jnp.where(rows_t[:, 1] == p_rep, 1, 0).astype(jnp.int32)
    self_state = jnp.arange(2 * S, dtype=jnp.int32)
    ptr = jnp.where(absorbing, self_state, kprime * S + q_slot)
    dist = jnp.where(absorbing, 0, 1).astype(jnp.int32)
    minv = p_rep.astype(jnp.int32)
    # second-smallest visited pixel (disjoint-window doubling merge):
    # needed to exclude the head from the arc id (labelpl arcs drop the
    # head pixel, so the arc id is min over chain MINUS head).
    minv2 = jnp.full_like(minv, n)
    absorb0 = absorbing
    # `term` = absorb0[ptr] and `end` = p_rep[ptr] ride as loop state
    # (update rule: a doubling moves ptr to ptr[t], and the gathered row
    # of t carries t's own term/end = absorb0[ptr[t]], p_rep[ptr[t]]),
    # replacing two (2S,)-row epilogue gathers with one init gather.
    rows0 = jnp.stack([absorb0.astype(jnp.int32), p_rep], axis=1)[ptr]
    term = rows0[:, 0]
    end = rows0[:, 1]

    # Phase 1: full-table doublings up to reach 2^k0.  On real frames the
    # overwhelming majority of walks absorb within a few steps (noise
    # strings are fragments); only long structure chains and cycles stay
    # live, so the remaining doublings run over a compacted sub-list.
    def _merge2(m1, m2, b1, b2):
        """(min, 2nd-min) of the union of two pixel windows.  Windows
        are disjoint during normal doubling, but once a walk saturates
        at a terminal it keeps re-merging a SUBSET window; subset
        elements are already accounted for, and the only corrupting
        case is b's min coinciding with a's min (the max(m1,b1) term
        would duplicate it into the 2nd-min slot) — guard it."""
        dup = m1 == b1
        cand = jnp.where(dup, n, jnp.maximum(m1, b1))
        return (jnp.minimum(m1, b1),
                jnp.minimum(jnp.minimum(m2, b2), cand))

    k0 = min(tail_switch_rounds, n_doublings) if tail_cap else n_doublings
    # term at ENTRY to the final phase-1 round; a state is a true
    # fixpoint only once a round has MERGED the absorbing row it rests
    # on (the terminal pixel enters minv/minv2 one round after the
    # pointer lands there), i.e. term_prev==1, not term==1.  For k0==0
    # only the originally-absorbing states are fixpoints.
    term_prev = absorb0.astype(jnp.int32)
    for _ in range(k0):
        packed = jnp.stack([dist, ptr, minv, term, end, minv2], axis=1)
        rows = _doubling_rows(packed, ptr, axis_name)   # one row gather
        term_prev = term
        dist = dist + rows[:, 0]
        minv, minv2 = _merge2(minv, minv2, rows[:, 2], rows[:, 5])
        term = rows[:, 3]
        end = rows[:, 4]
        ptr = rows[:, 1]

    if k0 < n_doublings:
        # Tail stages: a walk state is a fixpoint when its pointer
        # rested on an original absorbing state at entry to the last
        # round (absorbing rows never change, and that last round folded
        # the terminal's pixel into minv/minv2; a state that only LANDED
        # on the terminal in the last round still misses it and must
        # keep walking).  Each stage compacts the non-fixpoint states
        # into a sub-list, runs its rounds there (references to
        # fixpoints read the frozen full table, references within the
        # sub-list read the fresh sub state), then writes the sub state
        # back — so the next stage can re-compact to a smaller cap
        # (every extra reach doubling converges more states).
        # Bit-identical to the full walk: when a stage's survivors
        # exceed its cap (structure-rich scenes where most strings sit
        # on long chains), a runtime lax.cond runs that stage over the
        # full table instead of truncating.
        stages = tail_stages
        if stages is None:
            stages = ((n_doublings - k0, tail_cap),)
        # pack the state as one (2S, 7) matrix [dist, ptr, minv, term,
        # end, minv2, term_prev]: each stage's write-back is ONE row
        # scatter and each compaction ONE row gather
        M = jnp.stack([dist, ptr, minv, term, end, minv2,
                       term_prev.astype(jnp.int32)], axis=1)

        def full_stage(M, r):
            dist, ptr, minv, term, end, minv2, tp = (
                M[:, 0], M[:, 1], M[:, 2], M[:, 3], M[:, 4], M[:, 5],
                M[:, 6])
            for _ in range(r):
                packed = jnp.stack([dist, ptr, minv, term, end, minv2],
                                   axis=1)
                rows = _doubling_rows(packed, ptr, axis_name)
                tp = term
                dist = dist + rows[:, 0]
                minv, minv2 = _merge2(minv, minv2, rows[:, 2],
                                      rows[:, 5])
                term = rows[:, 3]
                end = rows[:, 4]
                ptr = rows[:, 1]
            return jnp.stack([dist, ptr, minv, term, end, minv2, tp],
                             axis=1)

        def sub_stage(M, r, C2, unconv):
            sids = jnp.arange(2 * S, dtype=jnp.int32)
            ranks = jnp.cumsum(unconv.astype(jnp.int32)) - 1
            take = unconv & (ranks < C2)
            sub_of = jnp.where(take, ranks, C2)   # elementwise
            sub_idx = jnp.full((C2 + 1,), 2 * S, jnp.int32).at[
                jnp.where(take, ranks, C2)].min(sids, mode="drop")[:C2]
            ssafe = jnp.clip(sub_idx, 0, 2 * S - 1)
            sub_live = sub_idx < 2 * S
            # frozen full table with the sub-rank map as a 7th column
            # (term_prev of frozen rows is dead weight during rounds)
            frozen = jnp.concatenate([M[:, :6], sub_of[:, None]], axis=1)
            st2 = frozen[ssafe][:, :6]
            tp2 = jnp.zeros((C2,), jnp.int32)     # unconv => term_prev 0
            for _ in range(r):
                rows_f = frozen[st2[:, 1]]
                js = rows_f[:, 6]
                in_sub = (js < C2)[:, None]
                rows_s = st2[jnp.clip(js, 0, C2 - 1)]
                rows = jnp.where(in_sub, rows_s, rows_f[:, :6])
                m1, m2 = _merge2(st2[:, 2], st2[:, 5],
                                 rows[:, 2], rows[:, 5])
                tp2 = st2[:, 3]
                st2 = jnp.stack(
                    [st2[:, 0] + rows[:, 0], rows[:, 1], m1,
                     rows[:, 3], rows[:, 4], m2], axis=1)
            tgt2 = jnp.where(sub_live, sub_idx, 2 * S)
            upd = jnp.concatenate([st2, tp2[:, None]], axis=1)
            return M.at[tgt2].set(upd, mode="drop")

        rounds_left = n_doublings - k0
        for si, (r_i, cap_i) in enumerate(stages):
            r_i = rounds_left if si == len(stages) - 1 else min(
                r_i, rounds_left)
            if r_i <= 0:
                continue
            if cap_i <= 0 or axis_name is not None or tail_pin == 2:
                # under shard_map the cond predicate must agree on every
                # device — n_unconv is replicated-identical, but keep
                # the sharded full path for simplicity there.
                # tail_pin == 2: batched mode pins the full-table path
                # (a vmapped cond would run both branches anyway)
                M = full_stage(M, r_i)
            elif tail_pin == 1:
                # batched mode pinned to the sub-list: overflow freezes
                # the dropped states at the switch reach (deterministic,
                # same as the documented overflow of the cond path)
                unconv = live2 & (M[:, 6] == 0)
                M = sub_stage(M, r_i, cap_i, unconv)
            else:
                unconv = live2 & (M[:, 6] == 0)
                n_unconv = jnp.sum(unconv.astype(jnp.int32))
                M = lax.cond(
                    n_unconv <= cap_i,
                    lambda m, u=unconv, r=r_i, c=cap_i: sub_stage(
                        m, r, c, u),
                    lambda m, r=r_i: full_stage(m, r), M)
            rounds_left -= r_i
        dist, ptr, minv, term, end, minv2 = (
            M[:, 0], M[:, 1], M[:, 2], M[:, 3], M[:, 4], M[:, 5])

    absorbed = term != 0
    endpix = end
    e0, d0, a0 = endpix[:S], dist[:S], absorbed[:S]
    e1, d1, a1 = endpix[S:], dist[S:], absorbed[S:]
    pick0 = e0 <= e1
    num_path = jnp.where(pick0, d0, d1)           # distance to the head
    okdir = jnp.where(pick0, a0, a1)
    head_path = jnp.minimum(e0, e1)

    # ---- cycle detection + root kill -------------------------------------
    cyc = live & ~a0 & ~a1
    root = jnp.minimum(minv[:S], minv[S:])        # cycle min flat index
    is_root = cyc & (p_s == root)
    sub = cyc & ~is_root

    number_s = jnp.where(live & okdir & ~cyc, num_path, 0).astype(jnp.int32)
    head_s = head_path
    # per-slot chain statistics, ELEMENTWISE from the walk (replacing
    # the per-head scatter histograms in the polyline tail): chain pixel
    # count excluding the head = d0 + d1, and the labelpl arc id = the
    # min flat index over the chain = min visited in both directions.
    # Valid where both directions absorbed; partially-numbered slots of
    # over-reach chains report their true length (>= the partial count
    # the old histogram saw — same keep decision above size_thre).
    chainlen_s = jnp.where(live & a0 & a1, d0 + d1, 0).astype(jnp.int32)
    arcmin_s = jnp.minimum(minv[:S], minv[S:])

    # ---- pass B: re-number the cut cycles over a tiny sub-list ----------
    # Real frames have FEW (typically zero) surviving cycles — closed
    # rings that pass stringify/removeBranch — yet the re-walk costs
    # n_doublings gather rounds over 2*cyc_cap states unconditionally.
    # A runtime cond skips the whole pass when no cycle slot exists
    # (the updates below are then the identity); cyc_pin pins the
    # branch for batched mode (2 = always run, the exact cond-free
    # choice; 1 = always skip, for callers that guarantee no cycles).
    C = cyc_cap

    def _cycle_pass(state):
        number_s, head_s, chainlen_s, arcmin_s = state
        slot_ids = jnp.arange(S, dtype=jnp.int32)
        ranks = jnp.cumsum(sub.astype(jnp.int32)) - 1
        take = sub & (ranks < C)                  # overflow -> number 0
        sub_idx = jnp.full((C + 1,), S, jnp.int32).at[
            jnp.where(take, ranks, C)].min(slot_ids, mode="drop")[:C]
        sub_of = jnp.full((S + 1,), C, jnp.int32).at[
            jnp.where(take, slot_ids, S)].min(
            jnp.where(take, ranks, C), mode="drop")
        sub_of = sub_of.at[S].set(C)

        ssafe = jnp.clip(sub_idx, 0, S - 1)
        sub_live = sub_idx < S
        p2 = p_s[ssafe]
        r2 = root[ssafe]
        n0_2 = n0_s[ssafe]
        n1_2 = n1_s[ssafe]

        nk2 = jnp.concatenate([n0_2, n1_2])
        p2_rep = jnp.concatenate([p2, p2])
        r2_rep = jnp.concatenate([r2, r2])
        live2b = jnp.concatenate([sub_live, sub_live])
        absorbing2 = (nk2 == p2_rep) | (nk2 == r2_rep) | ~live2b
        qs2 = comp.slot_of[jnp.clip(nk2, 0, n)]
        q2 = sub_of[jnp.clip(qs2, 0, S)]
        q2ok = q2 < C
        q2 = jnp.clip(q2, 0, C - 1)
        absorbing2 = absorbing2 | ~q2ok
        n0_at_q2 = n0_2[q2]
        kp2 = jnp.where(n0_at_q2 == p2_rep, 1, 0).astype(jnp.int32)
        self2 = jnp.arange(2 * C, dtype=jnp.int32)
        ptr2 = jnp.where(absorbing2, self2, kp2 * C + q2)
        dist2 = jnp.where(absorbing2, 0, 1).astype(jnp.int32)
        ab02 = absorbing2

        # cycles that fit the sub-list have <= C pixels, so reach 2^k >=
        # C fully numbers every cut path — identical to the dense
        # path's n_doublings whenever n_doublings also reaches C
        k_c = min(n_doublings, max(1, (C - 1).bit_length()))
        for _ in range(k_c):
            packed2 = jnp.stack([dist2, ptr2], axis=1)
            rows2 = packed2[ptr2]
            dist2 = dist2 + rows2[:, 0]
            ptr2 = rows2[:, 1]

        absorbed2 = ab02[ptr2]
        end2 = p2_rep[ptr2]
        e0b, d0b, a0b = end2[:C], dist2[:C], absorbed2[:C]
        e1b, d1b, a1b = end2[C:], dist2[C:], absorbed2[C:]
        pick0b = e0b <= e1b
        numb = jnp.where(pick0b, d0b, d1b)
        okb = jnp.where(pick0b, a0b, a1b)
        headb = jnp.minimum(e0b, e1b)
        numb = jnp.where(sub_live & okb, numb, 0).astype(jnp.int32)
        # Cut-cycle arc statistics use the OLD grouped semantics over the
        # (tiny) sub-list — residual cycles (a root whose removal leaves a
        # diagonal reconnection) produce partial walks where the
        # elementwise d0+d1 double-counts, but the per-head group
        # count/min matches the dense label_arcs path exactly.  All
        # scatters are at cyc_cap scale.
        hb_slot = comp.slot_of[jnp.clip(headb, 0, n)]
        hb_sub = sub_of[jnp.clip(hb_slot, 0, S)]
        grp_ok = sub_live & (numb > 0) & (hb_sub < C)
        grp = jnp.where(grp_ok, hb_sub, C)
        sizes_c = jnp.zeros((C + 1,), jnp.int32).at[grp].add(
            jnp.where(grp_ok, 1, 0), mode="drop")
        amin_c = jnp.full((C + 1,), n, jnp.int32).at[grp].min(
            p2, mode="drop")
        gsafe = jnp.clip(hb_sub, 0, C - 1)
        lenb = jnp.where(grp_ok, sizes_c[gsafe], 0).astype(jnp.int32)
        minb = jnp.where(grp_ok, amin_c[gsafe], n).astype(jnp.int32)

        tgt = jnp.where(sub_live, sub_idx, S)     # index S drops (OOB)
        number_s = number_s.at[tgt].set(numb, mode="drop")
        head_s = head_s.at[tgt].set(headb, mode="drop")
        chainlen_s = chainlen_s.at[tgt].set(lenb, mode="drop")
        arcmin_s = arcmin_s.at[tgt].set(minb, mode="drop")
        return number_s, head_s, chainlen_s, arcmin_s

    state0 = (number_s, head_s, chainlen_s, arcmin_s)
    if cyc_pin == 1:
        pass                                      # caller guarantees none
    elif cyc_pin == 2:
        state0 = _cycle_pass(state0)
    else:
        n_sub = jnp.sum(sub.astype(jnp.int32))
        state0 = lax.cond(n_sub > 0, _cycle_pass, lambda s: s, state0)
    number_s, head_s, chainlen_s, arcmin_s = state0
    # non-cycle slots: exclude the head pixel from the arc id (labelpl
    # drops number==0): if the chain min IS the head, take the 2nd-min
    # of the head-side direction merged with the other direction's min
    mh1 = jnp.where(pick0, minv[:S], minv[S:])
    mh2 = jnp.where(pick0, minv2[:S], minv2[S:])
    mt1 = jnp.where(pick0, minv[S:], minv[:S])
    arc_nohead = jnp.minimum(jnp.where(mh1 == head_path, mh2, mh1), mt1)
    arcmin_s = jnp.where(cyc, arcmin_s, arc_nohead)
    return number_s, head_s, live, cyc, chainlen_s, arcmin_s


def count_ends(junction, label, comp=None):
    """Per-component count of degree-2 (endpoint) pixels.

    countEnds (oclpolyline.cl:149-155): junction==2 means the pixel plus
    exactly one neighbor.  Returns an (H*W,) histogram indexed by label.
    The reference increments non-atomically (benign race, only ==0 is
    consumed); segment-sum is the deterministic equivalent.

    comp: optional Compaction of the string pixels (ends are a subset) —
    the scatter then runs over slots instead of the full frame.
    """
    h, w = junction.shape
    nsz = h * w
    if comp is not None:
        live = comp.valid()
        p = jnp.clip(comp.idx, 0, nsz - 1)
        yy = p // w
        xx = p % w
        interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
        jn_s = junction.reshape(-1)[p]
        lbl_s = label.reshape(-1)[p]
        is_end = live & interior & (jn_s == 2) & (lbl_s >= 0)
        tgt = jnp.where(is_end, lbl_s, nsz)
        return jnp.zeros((nsz + 1,), jnp.int32).at[tgt].add(
            jnp.where(is_end, 1, 0), mode="drop")[:nsz]
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    is_end = (junction == 2) & interior
    lbl = label.reshape(-1)
    tgt = jnp.where(is_end.reshape(-1) & (lbl >= 0), lbl, nsz)
    return jnp.zeros((nsz + 1,), jnp.int32).at[tgt].add(
        jnp.where(tgt < nsz, 1, 0), mode="drop")[:nsz]


def break_loops(edge_img, label, n_ends):
    """Delete the root pixel of endpoint-free components.

    breakLoops (oclpolyline.cl:157-167): where label == flat index (the
    component root) and the component has zero endpoints, clear the edge
    pixel and set its label to -1 — turning every cycle into a path.
    """
    h, w = label.shape
    idx2d = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    is_root = interior & (label == idx2d) & (label >= 0)
    kill = is_root & (n_ends.reshape(h, w) == 0)
    return (jnp.where(kill, 0, edge_img).astype(edge_img.dtype),
            jnp.where(kill, -1, label).astype(jnp.int32))
