"""Segment <-> region-boundary association and hypothesis grouping.

Covers the reference's reduceLS kernel (oclrect.cl:427-464) and the group-
building half of executeCPUTask (oclrect.c:1064-1114, 1175-1188), moved
on-chip:

  * reduceLS hashes (lsid * bid) into an open table of bbox entries with
    atomic_cmpxchg claims — first claimant wins, colliding pairs are
    dropped nondeterministically.  Here the slot owner is the
    lexicographically smallest (lsid, bid) claimant (deterministic,
    same relation, collisions still dropped).
  * the per-pixel 7x7 window scan keeps up to `k_slots` distinct boundary
    ids per pixel (the reference keeps all 49 with consecutive-dedup; >4
    distinct region boundaries within 3 px of one pixel is degenerate).
  * the CPU's ArrayMap of segid -> {lsid} sets becomes a dense membership
    matrix over (boundary group, segment id), built by scatter from the
    same 3x5 probe pattern (oclrect.c:1070-1096).
  * the polyline walk (source B, oclrect.c:1175-1188) becomes pointer
    doubling over left_ptr to find each segment's chain head.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rectdetect_tpu.ops.shifts import pad2d, shifted


class PairTable(NamedTuple):
    """Deterministic stand-in for the reduceLS hash table."""
    owner_lsid: jnp.ndarray   # (nentry,) int32, 0 = empty
    owner_bid: jnp.ndarray    # (nentry,) int32
    bb: jnp.ndarray           # (nentry, 4) int32: max(iw-x), max(x), max(ih-y), max(y)


def _hash(lsid, bid, nentry: int):
    """The reference's slot hash ((uint)lsid*(uint)bid & 0x7fffffff) %
    nentry (oclrect.cl:448)."""
    prod = (lsid.astype(jnp.uint32) * bid.astype(jnp.uint32)) & jnp.uint32(
        0x7fffffff)
    return (prod % jnp.uint32(nentry)).astype(jnp.int32)


def _distinct_bids(boundary, k_slots: int):
    """Up to k_slots distinct positive boundary ids in each pixel's 7x7
    window, in scan order (oclrect.cl:441-447)."""
    h, w = boundary.shape
    bp = pad2d(boundary, 3, "zero", constant=0)
    slots = [jnp.zeros((h, w), jnp.int32) for _ in range(k_slots)]
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            b = shifted(bp, 3, dy, dx, h, w)
            fresh = b > 0
            for s in slots:
                fresh = fresh & (s != b)
            for i in range(k_slots):
                free = slots[i] == 0
                put = fresh & free
                slots[i] = jnp.where(put, b, slots[i])
                fresh = fresh & ~put
    return slots


def pair_bbox_table(boundary, lsid_img, nentry: int, k_slots: int = 4,
                    edge_cap: int | None = None, comp=None,
                    bids_bh: int = 64):
    """Build the (segment, boundary) -> clip-bbox table (reduceLS,
    oclrect.cl:427-464).

    Sparse formulation: only edge pixels (lsid > 0) contribute, so the
    hash-table scatters run over a compacted fixed-capacity pixel list
    (ops/compact.py) instead of the full frame — the distinct-bid window
    scan stays dense (pure VPU shifts).

    comp: optional pre-built Compaction covering all lsid > 0 pixels
    (polyline_execute's arc compaction) — skips the full-frame prefix
    sum; slots with lsid == 0 simply contribute nothing."""
    from rectdetect_tpu.ops.compact import compact_mask, gather_image

    h, w = boundary.shape
    n = h * w
    if edge_cap is None:
        edge_cap = max(1024, n // 8)
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    lsid = jnp.where(interior & (lsid_img > 0), lsid_img, 0)

    if comp is None:
        comp = compact_mask((lsid > 0).reshape(-1), edge_cap)
    ls_s = gather_image(comp, lsid.reshape(-1))
    x_s = jnp.where(comp.valid(), comp.idx % w, 0)
    y_s = jnp.where(comp.valid(), comp.idx // w, 0)

    import jax

    if jax.default_backend() == "tpu" and k_slots == 4:
        # the 49-tap 4-slot window scan as VMEM rolls (bit-exact,
        # ops/pallas_morph.py)
        from rectdetect_tpu.ops.pallas_morph import distinct_bids_pallas
        slots = distinct_bids_pallas(boundary, bh=bids_bh)
    else:
        slots = _distinct_bids(boundary, k_slots)
    big = jnp.int32(2 ** 30)

    owner_lsid = jnp.full((nentry + 1,), big, jnp.int32)
    pairs = []
    for s in slots:
        bid = gather_image(comp, s.reshape(-1))
        v = (ls_s > 0) & (bid > 0)
        hsh = jnp.where(v, _hash(ls_s, bid, nentry), nentry)
        pairs.append((bid, v, hsh))
        owner_lsid = owner_lsid.at[hsh].min(jnp.where(v, ls_s, big),
                                            mode="drop")

    owner_bid = jnp.full((nentry + 1,), big, jnp.int32)
    for bid, v, hsh in pairs:
        mine = v & (owner_lsid[hsh] == ls_s)
        owner_bid = owner_bid.at[hsh].min(jnp.where(mine, bid, big),
                                          mode="drop")

    bb = jnp.zeros((nentry + 1, 4), jnp.int32)
    vals = jnp.stack([w - x_s, x_s, h - y_s, y_s], axis=1)
    for bid, v, hsh in pairs:
        mine = v & (owner_lsid[hsh] == ls_s) & (owner_bid[hsh] == bid)
        tgt = jnp.where(mine, hsh, nentry)
        bb = bb.at[tgt].max(jnp.where(mine[:, None], vals, 0), mode="drop")

    owner_lsid = jnp.where(owner_lsid == big, 0, owner_lsid)
    owner_bid = jnp.where(owner_bid == big, 0, owner_bid)
    return PairTable(owner_lsid[:nentry], owner_bid[:nentry], bb[:nentry])


def densify_labels(label, bg: int = -1):
    """Dense ids 1..count for a min-flat-index label image.

    Returns (dense (H,W), table (H*W+1,) flat->dense, count, rank —
    the inclusive root-rank cumsum, shareable with dense_roots)."""
    h, w = label.shape
    n = h * w
    flat = label.reshape(-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_root = (flat == idx) & (flat != bg)
    rank = jnp.cumsum(is_root.astype(jnp.int32))
    table = jnp.where(is_root, rank, 0).astype(jnp.int32)
    dense = jnp.where(flat != bg, table[jnp.clip(flat, 0, n - 1)], 0)
    return dense.reshape(h, w), table, rank[-1], rank


def dense_roots(label, k: int, bg: int = -1, rank=None):
    """Flat index of the root of each dense id 1..k, as a (k+1,) table.

    roots[g] = first flat position where the inclusive root-rank reaches
    g — k log-probes via searchsorted instead of a full-frame scatter
    (which costs ~8 ms at 720p for what is a k~200-entry result).
    Ids beyond the actual root count return n (no such root).

    rank: optional precomputed inclusive root-rank cumsum (the same
    array densify_labels builds — pass it to share the full-frame scan).
    """
    h, w = label.shape
    n = h * w
    if rank is None:
        flat = label.reshape(-1)
        idx = jnp.arange(n, dtype=jnp.int32)
        is_root = (flat == idx) & (flat != bg)
        rank = jnp.cumsum(is_root.astype(jnp.int32))
    gs = jnp.arange(k + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(rank, gs, side="left").astype(jnp.int32)
    ok = (gs >= 1) & (gs <= rank[-1])
    return jnp.where(ok, pos, n)


def probe_membership(boundary, arena, n_groups: int, table,
                     probe_n: int = 3, probe_dist: int = 2):
    """Membership matrix M[group, lsid] from the 3x5 probe pattern around
    each live segment (oclrect.c:1070-1096).

    boundary: (H,W) boundary-label image (flat-index labels, -1 bg);
    table: flat->dense id map from densify_labels.  Group g = dense
    boundary id g (1..n_groups)."""
    h, w = boundary.shape
    cap = arena.cap
    live = arena.polyid != 0
    x0 = jnp.rint(arena.sx)
    y0 = jnp.rint(arena.sy)
    x1 = jnp.rint(arena.ex)
    y1 = jnp.rint(arena.ey)
    dx = x1 - x0
    dy = y1 - y0
    ln = jnp.sqrt(dx * dx + dy * dy)
    vdx = -dy / jnp.maximum(ln, 1e-20)
    vdy = dx / jnp.maximum(ln, 1e-20)

    lsids = jnp.arange(cap, dtype=jnp.int32)
    dense_all = []
    for j in range(probe_n):
        fj = (j + 0.5) / probe_n
        px = x0 + dx * fj
        py = y0 + dy * fj
        for dist in range(-probe_dist, probe_dist + 1):
            cx = jnp.floor(px + vdx * dist + 0.5).astype(jnp.int32)
            cy = jnp.floor(py + vdy * dist + 0.5).astype(jnp.int32)
            inb = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h) & live
            flat = jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)
            segid = boundary.reshape(-1)[flat]
            ok = inb & (segid > 0)
            dense = jnp.where(ok, table[jnp.clip(segid, 0, h * w - 1)], 0)
            dense_all.append(jnp.where(dense <= n_groups, dense, 0))
    # all probe points in ONE membership scatter (duplicates idempotent)
    m = jnp.zeros((n_groups + 1, cap), bool).at[
        (jnp.concatenate(dense_all),
         jnp.tile(lsids, len(dense_all)))].set(True, mode="drop")
    return m.at[0].set(False)


def first_k_members(g, lsid, n_groups: int, k: int, cap: int):
    """The k smallest distinct member lsids per group, from a sparse
    (group, lsid) candidate relation.

    Replaces the dense (n_groups+1, cap) membership matrix + top_k over
    an int32 score matrix (pipeline/rect._members_from_matrix), which
    transiently materializes G*cap int32 — ~2 GB at 4K-dense calibrated
    caps (max_groups 2048 x ls_capacity 262144).  The relation form is
    O(M log M) in the candidate count (15*cap for the probe pattern)
    with O(M) memory, and the selection is identical: the matrix path's
    score = cap - lsid makes top-k exactly the k smallest lsids, with
    duplicate candidates collapsing idempotently.

    g, lsid: (M,) int32 candidate pairs; entries with g < 1,
    g > n_groups, lsid < 1 or lsid >= cap are ignored (matching the
    matrix path, whose group 0 is cleared and whose lsid 0 column is
    never set by a live segment).
    Returns (ids (n_groups, k) int32 — 0-filled beyond the member
    count, valid (n_groups, k) bool, counts (n_groups+1,) int32
    distinct-member counts, counts[0] == 0).
    """
    import jax

    # composite key fits int32: calibration bounds n_groups <= 2048 and
    # cap <= 262144 (runtime/calibrate.py), so (g*cap + lsid) < 2^31
    assert (n_groups + 1) * cap < 2 ** 31 - 1, (n_groups, cap)
    ok = (g > 0) & (g <= n_groups) & (lsid > 0) & (lsid < cap)
    big = jnp.int32(2 ** 31 - 1)
    key = jnp.where(ok, g * cap + lsid, big)
    skey = jax.lax.sort(key)
    live = skey < big
    first = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]) & live
    sg = jnp.where(live, skey // cap, n_groups + 1)
    sl = jnp.where(live, skey % cap, 0)
    dr = jnp.cumsum(first.astype(jnp.int32)) - 1        # distinct rank
    newg = first & jnp.concatenate(
        [jnp.ones((1,), bool), sg[1:] != sg[:-1]])
    # dr is nondecreasing, so a running max of dr frozen at group firsts
    # forward-fills each group's base distinct rank
    base = jax.lax.cummax(jnp.where(newg, dr, 0))
    rig = dr - base                                     # rank in group
    take = first & (rig < k)
    flat_tgt = jnp.where(take, (sg - 1) * k + rig, n_groups * k)
    ids = jnp.zeros((n_groups * k + 1,), jnp.int32).at[flat_tgt].set(
        jnp.where(take, sl, 0), mode="drop")[:-1].reshape(n_groups, k)
    valid = jnp.zeros((n_groups * k + 1,), bool).at[flat_tgt].set(
        take, mode="drop")[:-1].reshape(n_groups, k)
    counts = jnp.zeros((n_groups + 2,), jnp.int32).at[
        jnp.where(first, sg, n_groups + 1)].add(
        jnp.where(first, 1, 0), mode="drop")[:n_groups + 1]
    return ids, valid, counts


def probe_members(boundary, arena, n_groups: int, table, k: int,
                  probe_n: int = 3, probe_dist: int = 2):
    """Sparse-relation form of probe_membership: the k smallest member
    lsids per boundary group from the 3x5 probe pattern
    (oclrect.c:1070-1096), without the (n_groups+1, cap) matrix.
    Returns (ids, valid, counts) as first_k_members."""
    h, w = boundary.shape
    cap = arena.cap
    live = arena.polyid != 0
    x0 = jnp.rint(arena.sx)
    y0 = jnp.rint(arena.sy)
    x1 = jnp.rint(arena.ex)
    y1 = jnp.rint(arena.ey)
    dx = x1 - x0
    dy = y1 - y0
    ln = jnp.sqrt(dx * dx + dy * dy)
    vdx = -dy / jnp.maximum(ln, 1e-20)
    vdy = dx / jnp.maximum(ln, 1e-20)

    lsids = jnp.arange(cap, dtype=jnp.int32)
    dense_all = []
    for j in range(probe_n):
        fj = (j + 0.5) / probe_n
        px = x0 + dx * fj
        py = y0 + dy * fj
        for dist in range(-probe_dist, probe_dist + 1):
            cx = jnp.floor(px + vdx * dist + 0.5).astype(jnp.int32)
            cy = jnp.floor(py + vdy * dist + 0.5).astype(jnp.int32)
            inb = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h) & live
            flat = jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)
            segid = boundary.reshape(-1)[flat]
            ok = inb & (segid > 0)
            dense = jnp.where(ok, table[jnp.clip(segid, 0, h * w - 1)], 0)
            dense_all.append(jnp.where(dense <= n_groups, dense, 0))
    g = jnp.concatenate(dense_all)
    ls = jnp.tile(lsids, len(dense_all))
    return first_k_members(g, ls, n_groups, k, cap)


def chain_members(arena, n_groups: int, k: int, ls_thre: float = 32.0):
    """Sparse-relation form of chain_membership: k smallest member lsids
    per polyline chain group.  Returns (ids, valid)."""
    cap = arena.cap
    ids = jnp.arange(cap, dtype=jnp.int32)
    heads = chain_heads(arena)
    is_head = (arena.polyid != 0) & (arena.left_ptr <= 0) & (ids > 0)
    rank = jnp.cumsum(is_head.astype(jnp.int32))
    head_dense = jnp.where(is_head, rank, 0).astype(jnp.int32)

    sq = (arena.ex - arena.sx) ** 2 + (arena.ey - arena.sy) ** 2
    member = (arena.polyid != 0) & (sq > ls_thre * ls_thre)
    g = head_dense[heads]
    g = jnp.where(member & (g > 0) & (g <= n_groups), g, 0)
    mids, mvalid, _ = first_k_members(g, ids, n_groups, k, cap)
    return mids, mvalid


def chain_heads(arena, n_doublings: int | None = None):
    """Chain head of every segment by pointer doubling over left_ptr
    (source B walks rightPtr from heads, oclrect.c:1175-1188).
    Chains cannot exceed the arena capacity, so ceil(log2(cap))
    doublings always converge."""
    cap = arena.cap
    if n_doublings is None:
        n_doublings = max(1, (cap - 1).bit_length())
    ids = jnp.arange(cap, dtype=jnp.int32)
    ptr = jnp.where(arena.left_ptr > 0, arena.left_ptr, ids)
    for _ in range(n_doublings):
        ptr = ptr[ptr]
    return ptr


def chain_membership(arena, n_groups: int, ls_thre: float = 32.0):
    """Membership matrix for polyline groups: head-dense-id x lsid.

    Returns (m (n_groups+1, cap) bool, head_rank table (cap,))."""
    cap = arena.cap
    ids = jnp.arange(cap, dtype=jnp.int32)
    heads = chain_heads(arena)
    is_head = (arena.polyid != 0) & (arena.left_ptr <= 0) & (ids > 0)
    rank = jnp.cumsum(is_head.astype(jnp.int32))
    head_dense = jnp.where(is_head, rank, 0).astype(jnp.int32)

    sq = (arena.ex - arena.sx) ** 2 + (arena.ey - arena.sy) ** 2
    member = (arena.polyid != 0) & (sq > ls_thre * ls_thre)
    g = head_dense[heads]
    g = jnp.where(member & (g > 0) & (g <= n_groups), g, 0)
    m = jnp.zeros((n_groups + 1, cap), bool)
    m = m.at[(g, ids)].set(True, mode="drop")
    return m.at[0].set(False), head_dense
