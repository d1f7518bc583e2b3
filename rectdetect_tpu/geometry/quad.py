"""Quad hypothesis reduction, batched on-chip.

The reference reduces each candidate segment group to a quad on the CPU
(oclrect.c:1134-1151): removeShortLS -> pickExternalLS (quickHull + per-
hull-edge pick) -> pickLongestLS(4) -> sortByAngle -> findCorners ->
convexity/triangle/length checks.  Here the whole chain is fixed-shape
tensor code vmapped over G groups of <= K segments:

  * quickHull (oclrect.c:660-734) -> Jarvis march with a fixed step count:
    same hull vertex set and cyclic order (possibly different starting
    point/direction, which only permutes hull-edge processing order);
  * EGBuf removal loops -> masks;
  * qsorts -> fixed-size argsort.

Rejected groups return ok=False; everything stays (G, ...) shaped for the
pose stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e30


def _sq_len(segs):
    d = segs[:, 1] - segs[:, 0]
    return jnp.sum(d * d, axis=1)


def _closest_point_line(v, w, p):
    """closestPoint2 (oclrect.c:400-406): unclamped projection onto the
    line v-w."""
    d = w - v
    l2 = jnp.sum(d * d, axis=-1, keepdims=True)
    t = jnp.sum((p - v) * d, axis=-1, keepdims=True) / jnp.maximum(l2, 1e-20)
    t = jnp.where(l2 > 0, t, 0.0)
    return v + t * d


def _closest_point_ls(v, w, p):
    """closestPointLS2 (oclrect.c:408-416): clamped to the segment."""
    d = w - v
    l2 = jnp.sum(d * d, axis=-1, keepdims=True)
    t = jnp.sum((p - v) * d, axis=-1, keepdims=True) / jnp.maximum(l2, 1e-20)
    t = jnp.clip(jnp.where(l2 > 0, t, 0.0), 0.0, 1.0)
    return v + t * d


def remove_short(segs, valid, ratio: float = 0.05):
    """removeShortLS (oclrect.c:926-943): drop segments shorter than
    ratio x the longest, but never below 4 survivors.  Returns a new valid
    mask; (never drops anything when <= 4 are valid)."""
    n_valid = jnp.sum(valid)
    sq = jnp.where(valid, _sq_len(segs), -1.0)
    longest = jnp.max(sq)
    passes = sq > ratio * ratio * longest
    # rank by length descending among valid
    order = jnp.argsort(-sq)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    keep = valid & (passes | (rank < 4))
    return jnp.where(n_valid <= 4, valid, keep)


def jarvis_hull(pts, valid, max_vertices: int):
    """Convex hull (ordered) by gift wrapping; the TPU stand-in for
    quickHull2 (oclrect.c:697-734): same vertex cycle.

    pts: (P,2); valid: (P,). Returns (idx (H,), hull_valid (H,))."""
    p = pts.shape[0]
    x = jnp.where(valid, pts[:, 0], -BIG)
    # start at the rightmost point (vRight, oclrect.c:705); tie -> lowest idx
    start = jnp.argmax(x)

    def step(carry, _):
        cur, done = carry
        c = pts[cur]
        rel = pts - c                                   # (P,2)
        dist = jnp.sum(rel * rel, axis=1)
        cand_ok = valid & (dist > 1e-12)
        # next vertex: candidate with no other point strictly to its left.
        # Two thresholds, both required:
        #   * sine of the angle (cross / product of lengths) — raw f32
        #     cross noise scales with coordinate^2 and a fixed epsilon
        #     breaks under fused-multiply-add reassociation;
        #   * 0.1 px perpendicular distance (cross / |rel_i|) — the
        #     reference's quickHull culls vertices within 0.1 px of the
        #     chord (d < 0.01 on the squared distance, oclrect.c:697-734),
        #     so a long near-straight side stays ONE hull edge.  Without
        #     it a 0.04 px bend splits a quad side into two hull edges,
        #     pickExternalLS picks both collinear halves, and
        #     pickLongestLS(4) builds a degenerate quad whose corner
        #     intersections explode (round-3 photo-corpus finding).
        cross = rel[:, None, 0] * rel[None, :, 1] - \
            rel[:, None, 1] * rel[None, :, 0]           # cross(c_i, p_j)
        norm = jnp.sqrt(jnp.maximum(dist[:, None] * dist[None, :], 1e-20))
        thr = jnp.maximum(1e-5 * norm,
                          0.1 * jnp.sqrt(jnp.maximum(dist, 1e-20))[:, None])
        left = (cross > thr) & cand_ok[None, :]
        has_left = jnp.any(left, axis=1)
        good = cand_ok & ~has_left
        # among good candidates pick the farthest (skips collinear mids)
        score = jnp.where(good, dist, -1.0)
        nxt = jnp.argmax(score)
        ok = jnp.any(good) & ~done & (nxt != start)
        done_next = done | ~jnp.any(good) | (nxt == start)
        out_idx = jnp.where(ok, nxt, -1)
        return (jnp.where(ok, nxt, cur), done_next), out_idx

    (_, _), idxs = jax.lax.scan(step, (start, jnp.asarray(False)),
                                None, length=max_vertices - 1)
    idx = jnp.concatenate([start[None], idxs])
    hull_valid = idx >= 0
    idx = jnp.where(hull_valid, idx, 0)
    return idx, hull_valid


def pick_external(segs, valid, max_vertices: int):
    """pickExternalLS (oclrect.c:945-992): hull of all endpoints; for each
    hull edge pick the longest remaining segment that hugs or parallels
    it.  Returns (picked (H,) segment indices or -1)."""
    k = segs.shape[0]
    pts = segs.reshape(k * 2, 2)
    pvalid = jnp.repeat(valid, 2)
    hidx, hvalid = jarvis_hull(pts, pvalid, max_vertices)
    q = pts[hidx]                                        # (H,2)
    nh = jnp.sum(hvalid)
    # successor within the valid prefix: (i+1) mod nh
    idxs = jnp.arange(q.shape[0])
    qnext = q[jnp.where(idxs + 1 < nh, idxs + 1, 0)]

    sq = _sq_len(segs)
    e0 = segs[:, 0]
    e1 = segs[:, 1]
    de = (e0 - e1) / jnp.maximum(
        jnp.sqrt(sq)[:, None], 1e-20)

    DTHRE0, ATHRE1, DTHRE1 = 1.0, 0.95, 0.01

    def edge_step(picked_mask, i):
        q0 = q[i]
        q1 = qnext[i]
        m = (q0 + q1) * 0.5
        cp = _closest_point_ls(e0, e1, m[None, :])
        dm = jnp.sum((m[None, :] - cp) ** 2, axis=1)
        close = dm < DTHRE0
        nq01 = (q0 - q1) / jnp.maximum(jnp.linalg.norm(q0 - q1), 1e-20)
        para = (jnp.abs(jnp.sum(nq01[None, :] * de, axis=1)) > ATHRE1) & \
            (dm / jnp.maximum(jnp.sum((q0 - q1) ** 2), 1e-20) < DTHRE1)
        ok = valid & ~picked_mask & (close | para) & hvalid[i]
        score = jnp.where(ok, sq, -1.0)
        j = jnp.argmax(score)
        any_ok = jnp.any(ok)
        pick = jnp.where(any_ok, j, -1)
        picked_mask = picked_mask | (any_ok &
                                     (jnp.arange(k) == j))
        return picked_mask, pick

    _, picks = jax.lax.scan(edge_step, jnp.zeros((k,), bool),
                            jnp.arange(q.shape[0]))
    return picks


def sort_by_angle(segs4, gv):
    """sortByAngle (oclrect.c:821-862) on exactly 4 segments."""
    e0 = segs4[:, 0]
    e1 = segs4[:, 1]
    v = e0 - e1
    v = jnp.stack([v[:, 1], -v[:, 0]], axis=1)
    flip = jnp.sum(v * (e0 - gv[None, :]), axis=1) < 0
    v = jnp.where(flip[:, None], -v, v)
    a = jnp.arctan2(v[:, 0], v[:, 1])
    order = jnp.argsort(a)
    return segs4[order]


def intersections(segs4):
    """findCorners (oclrect.c:1011-1045): corner i = intersection of edge i
    and edge i+1 (intersection2, oclrect.c:418-425).  Returns
    (corners (4,2), ok)."""
    u0 = segs4[:, 0]
    u1 = segs4[:, 1]
    v0 = jnp.roll(segs4[:, 0], -1, axis=0)
    v1 = jnp.roll(segs4[:, 1], -1, axis=0)
    d = (v1[:, 0] - v0[:, 0]) * (u1[:, 1] - u0[:, 1]) - \
        (v1[:, 1] - v0[:, 1]) * (u1[:, 0] - u0[:, 0])
    ok = jnp.all(jnp.abs(d) >= 1e-4)
    n = (v0[:, 1] - u0[:, 1]) * (u1[:, 0] - u0[:, 0]) - \
        (v0[:, 0] - u0[:, 0]) * (u1[:, 1] - u0[:, 1])
    qq = n / jnp.where(jnp.abs(d) < 1e-4, 1.0, d)
    c = v0 + qq[:, None] * (v1 - v0)
    return c, ok


def close_to_triangle(corner_segs, ratio: float = 0.001):
    """closeToTriangle (oclrect.c:886-895) on the 4 corner segments."""
    e0 = corner_segs[:, 0]
    e1 = corner_segs[:, 1]
    n0 = jnp.roll(e1, -1, axis=0)     # ls1.e1
    cp = _closest_point_line(e0, n0, e1)
    d0 = jnp.sum((e1 - cp) ** 2, axis=1)
    d1 = jnp.sum((e0 - n0) ** 2, axis=1)
    return jnp.any(d0 / jnp.maximum(d1, 1e-20) < ratio)


def is_convex(corner_segs):
    """isConvex (oclrect.c:897-922)."""
    d = corner_segs[:, 1] - corner_segs[:, 0]
    dn = jnp.roll(d, -1, axis=0)
    cr = d[:, 0] * dn[:, 1] - d[:, 1] * dn[:, 0]
    sign0 = cr[0] > 0
    return jnp.all((cr > 0) == sign0)


def _reduce_one(segs, valid, max_vertices: int):
    """Full reduction for one group: (K,2,2), (K,) -> (corners (4,2), ok)."""
    k = segs.shape[0]
    valid = valid & (_sq_len(segs) > 0)
    valid = remove_short(segs, valid)
    picks = pick_external(segs, valid, max_vertices)

    picked_valid = picks >= 0
    pick_idx = jnp.where(picked_valid, picks, 0)
    psegs = segs[pick_idx]                                # (H,2,2)
    plens = jnp.where(picked_valid, jnp.sqrt(_sq_len(psegs)), 0.0)
    len0 = jnp.sum(plens)

    # pickLongestLS(4) (oclrect.c:994-1009)
    order = jnp.argsort(-jnp.where(picked_valid, _sq_len(psegs), -1.0))
    top4 = order[:4]
    enough = jnp.sum(picked_valid) >= 4
    segs4 = psegs[top4]

    # gv (oclrect.c:864-877): length-weighted midpoint mean
    l4 = jnp.sqrt(_sq_len(segs4))
    mid = (segs4[:, 0] + segs4[:, 1]) * 0.5
    gv = jnp.sum(mid * l4[:, None], axis=0) / jnp.maximum(jnp.sum(l4), 1e-20)

    segs4 = sort_by_angle(segs4, gv)
    corners, cok = intersections(segs4)
    corner_segs = jnp.stack([corners, jnp.roll(corners, -1, axis=0)], axis=1)
    len1 = jnp.sum(jnp.sqrt(_sq_len(corner_segs)))

    ok = (enough & cok
          & ~close_to_triangle(corner_segs)
          & (len1 <= 2.0 * len0)
          & is_convex(corner_segs))
    return corners, ok


def reduce_groups(segs, valid, max_vertices: int = 24):
    """Batched reduction: segs (G,K,2,2), valid (G,K) ->
    (corners (G,4,2), ok (G,))."""
    return jax.vmap(lambda s, v: _reduce_one(s, v, max_vertices))(segs, valid)
