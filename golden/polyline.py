"""Golden model of the polyline stage (oclpolyline.cl / oclpolyline.c).

Loop-level NumPy oracle.  It follows the reference's *semantics* with the
deterministic choices the TPU build makes explicit (SURVEY.md §4 / §7):

  * mkpl argmax ties broken by MIN flat pixel index (the reference XORs
    13 random bits to uniquify nondeterministically, oclpolyline.cl:536)
  * new-segment ids allocated in segment-id order (reference: atomic order)
  * refine_pass3 snapping computed from pre-snap coordinates (reference
    tolerates read/write races there)

Everything else — getnp neighbor order, head numbering, arc labeling,
split conditions, least-squares refinement — mirrors the cited kernels.
"""

from __future__ import annotations

import numpy as np

RX = [1, 1, 0, -1, -1, -1, 0, 1]
RY = [0, -1, -1, -1, 0, 1, 1, 1]

MINEDGELEN = 1.0
MINNINDEX = 4
FIX = 65536.0


def getnp(label, p0, iw, ih):
    """First/second same-label neighbor (getnp, oclpolyline.cl:169-191)."""
    l = label.flat[p0]
    hits = []
    for i in range(8):
        p1 = p0 + RX[i] + RY[i] * iw
        if label.flat[p1] == l:
            hits.append(p1)
        if len(hits) == 2:
            break
    n0 = hits[0] if len(hits) >= 1 else p0
    n1 = hits[1] if len(hits) >= 2 else p0
    return n0, n1


def chain_neighbors(label):
    ih, iw = label.shape
    n0 = np.arange(ih * iw)
    n1 = np.arange(ih * iw)
    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            p0 = y * iw + x
            if label[y, x] < 0:
                continue
            n0[p0], n1[p0] = getnp(label, p0, iw, ih)
    return n0, n1


def arc_number(label):
    """Arc-length index from the canonical (min flat index) chain end.

    Oracle for the findEnds0/1/2 + number sequence (oclpolyline.cl:193-310):
    walks each chain explicitly.
    """
    ih, iw = label.shape
    n0, n1 = chain_neighbors(label)
    number = np.zeros(ih * iw, np.int64)
    visited = np.zeros(ih * iw, bool)

    def walk(start):
        """Pixels along the chain from `start` (an end), in order."""
        path = [start]
        prev = -1
        cur = start
        for _ in range(ih * iw):
            a, b = n0[cur], n1[cur]
            nxt = a if a != prev else b
            if nxt == cur:          # self-pointer: reached the other end
                break
            prev, cur = cur, nxt
            path.append(cur)
        return path

    for p in range(ih * iw):
        if label.flat[p] < 0 or visited[p]:
            continue
        # collect the component
        comp = [p]
        visited[p] = True
        stack = [p]
        while stack:
            q = stack.pop()
            for r in (n0[q], n1[q]):
                if r != q and not visited[r]:
                    visited[r] = True
                    comp.append(r)
                    stack.append(r)
        ends = [q for q in comp
                if (n0[q] == q) or (n1[q] == q)]
        if not ends:
            continue  # cycle: reference garbage; breakLoops prevents this
        head = min(ends)
        for i, q in enumerate(walk(head)):
            number[q] = i
    return number.reshape(ih, iw)


def label_arcs(number):
    """labelpl oracle: union-find over 8-neighbors with |dn| <= 1
    (labelpl_main, oclpolyline.cl:325-355); number==0 is background."""
    ih, iw = number.shape
    parent = np.arange(ih * iw)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            if number[y, x] <= 0:
                continue
            p0 = y * iw + x
            for dy, dx in ((0, 1), (1, -1), (1, 0), (1, 1)):
                yy, xx = y + dy, x + dx
                if number[yy, xx] > 0 and \
                        abs(int(number[y, x]) - int(number[yy, xx])) <= 1:
                    ra, rb = find(p0), find(yy * iw + xx)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)

    out = np.zeros(ih * iw, np.int64)
    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            if number[y, x] > 0:
                out[y * iw + x] = find(y * iw + x)
    return out.reshape(ih, iw)


def filter_and_relabel(arcs, size_thre):
    """calcSize + filterSize + relabel (oclpolyline.cl:357-420), with the
    deterministic rank-by-root-index id assignment."""
    ih, iw = arcs.shape
    labels, counts = np.unique(arcs[arcs != 0], return_counts=True)
    keep = set(labels[counts > size_thre].tolist())
    out = np.where(np.isin(arcs, list(keep)), arcs, 0)
    roots = sorted(keep & set(out.flatten().tolist()))
    table = {g: i + 1 for i, g in enumerate(roots)}
    dense = np.zeros_like(out)
    for g, i in table.items():
        dense[out == g] = i
    dense[0, :] = dense[-1, :] = 0
    dense[:, 0] = dense[:, -1] = 0
    return dense, len(roots)


def closest_point(vx, vy, wx, wy, px, py):
    l2 = (vx - wx) ** 2 + (vy - wy) ** 2
    if l2 <= 1e-4:
        return vx, vy
    t = ((px - vx) * (wx - vx) + (py - vy) * (wy - vy)) / l2
    t = min(max(t, 0.0), 1.0)
    return vx + t * (wx - vx), vy + t * (wy - vy)


class Seg:
    __slots__ = ("sx", "sy", "ex", "ey", "si", "ei", "left", "right",
                 "sc", "ec", "polyid", "npix", "level")

    def __init__(self):
        self.sx = self.sy = self.ex = self.ey = 0.0
        self.si = self.ei = 0
        self.left = self.right = 0
        self.sc = self.ec = 0
        self.polyid = 0
        self.npix = 0
        self.level = 0


def mkpl(label, number, minerror, cap, n_iters):
    """mkpl_pass0a/0b + the pass1/2/3 loop (oclpolyline.cl:439-646)."""
    ih, iw = label.shape
    segs = [Seg() for _ in range(cap)]
    lab = label.astype(np.int64).copy()
    count = 0

    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            g = lab[y, x]
            n = number[y, x]
            if g <= 0 or g >= cap:
                continue
            s = segs[g]
            if n == 1:
                s.sx, s.sy = float(x), float(y)
                s.sc += 1
            s.npix += 1
            s.ei = max(s.ei, int(n))
            count = max(count, int(g))

    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            g = lab[y, x]
            n = number[y, x]
            if g <= 0 or g >= cap:
                continue
            s = segs[g]
            if n == s.ei:
                if s.sc == 1 and s.npix >= 2:
                    if s.ec == 0 and s.polyid == 0:
                        s.ex, s.ey = float(x), float(y)
                        s.polyid = int(g)
                    s.ec += 1
                else:
                    s.polyid = 0

    minerr_fix = int(minerror * FIX)
    for _ in range(n_iters - 1):
        # pass1: per-segment max fixed-point deviation + min-index winner
        maxd = np.full(cap, -1, np.int64)
        dist_img = np.full(ih * iw, -1, np.int64)
        for y in range(ih):
            for x in range(iw):
                g = lab[y, x]
                if g <= 0 or g >= cap or segs[g].polyid == 0:
                    continue
                s = segs[g]
                cx, cy = closest_point(s.sx, s.sy, s.ex, s.ey, x, y)
                # f32 like the device (hypot on floats, oclpolyline.cl:535)
                d = int(np.float32(np.hypot(np.float32(cx - x),
                                            np.float32(cy - y)))
                        * np.float32(65536))
                dist_img[y * iw + x] = d
                maxd[g] = max(maxd[g], d)
        winner = np.full(cap, ih * iw, np.int64)
        for p in range(ih * iw):
            g = lab.flat[p]
            if g <= 0 or g >= cap or segs[g].polyid == 0:
                continue
            if dist_img[p] == maxd[g] and p < winner[g]:
                winner[g] = p

        # pass2: split (reads pre-split state; ids in segment order)
        old = [(s.sx, s.sy, s.ex, s.ey, s.si, s.ei, s.left, s.right,
                s.sc, s.ec, s.polyid) for s in segs]
        new_id = count
        for g in range(1, count + 1):
            sx, sy, ex, ey, si, ei, left, right, sc, ec, polyid = old[g]
            if polyid == 0 or winner[g] >= ih * iw:
                continue
            if ei - si < MINNINDEX - 1:
                continue
            if sc > 1 or ec > 1:
                continue
            md = maxd[g]
            if md < minerr_fix:
                continue
            chord_sq = (sx - ex) ** 2 + (sy - ey) ** 2
            if md < minerror * 3 * 65536 and \
                    float(md) * md / max(chord_sq, 1e-30) < 100000.0:
                continue
            wx, wy = winner[g] % iw, winner[g] // iw
            if (wx - sx) ** 2 + (wy - sy) ** 2 < MINEDGELEN ** 2:
                continue
            if (wx - ex) ** 2 + (wy - ey) ** 2 < MINEDGELEN ** 2:
                continue
            new_id += 1
            gn = new_id
            if gn >= cap:
                continue
            n_w = int(number[wy, wx])
            ns = segs[gn]
            ns.si, ns.ei = n_w, ei
            ns.sx, ns.sy = float(wx), float(wy)
            ns.ex, ns.ey = ex, ey
            ns.left, ns.right = g, right
            ns.polyid = polyid
            ns.level = int(md)
            sg = segs[g]
            sg.ei = n_w
            sg.ex, sg.ey = float(wx), float(wy)
            sg.right = gn
            if right != 0:
                segs[right].left = gn
        count = min(new_id, cap - 1)

        # pass3: move pixels past splits one right hop
        for y in range(ih):
            for x in range(iw):
                g = lab[y, x]
                if g <= 0 or g >= cap or segs[g].polyid == 0:
                    continue
                if segs[g].ei < number[y, x]:
                    lab[y, x] = segs[g].right
    return segs, lab, count


def count_ends(junction, label):
    """countEnds oracle (oclpolyline.cl:149-155)."""
    ih, iw = junction.shape
    out = np.zeros(ih * iw, np.int64)
    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            if junction[y, x] == 2 and label[y, x] >= 0:
                out[label[y, x]] += 1
    return out


def break_loops(edge, label, n_ends):
    """breakLoops oracle (oclpolyline.cl:157-167)."""
    ih, iw = label.shape
    edge = edge.copy()
    label = label.copy()
    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            p0 = y * iw + x
            if label[y, x] == p0 and n_ends[p0] == 0:
                edge[y, x] = 0
                label[y, x] = -1
    return edge, label


def polyline_execute(edge_binary, minerror, size_thre, cap,
                     n_iters=16, do_refine=True):
    """Full golden chain mirroring oclpolyline_execute
    (oclpolyline.c:218-309)."""
    from golden import labeling

    jn = labeling.simple_junction(edge_binary)
    conn = labeling.simple_connect_poly(jn)
    s = labeling.stringify(conn, 0)
    s = labeling.stringify(s, 1)
    strings = labeling.remove_branch(s)

    label = labeling.label_components(strings, 0)
    jn2 = labeling.simple_junction(strings)
    nends = count_ends(jn2, label)
    strings, label = break_loops(strings, label, nends)

    number = arc_number(label)
    arcs = label_arcs(number)
    dense, _ = filter_and_relabel(arcs, size_thre)
    segs, lab, count = mkpl(dense, number, minerror, cap, n_iters)
    if do_refine:
        segs = refine(segs, lab, count)
    return segs, lab, count


def refine(segs, lab, count):
    """refine_pass0..3 (oclpolyline.cl:680-809), int64 moments like the
    reference, snap from pre-snap coordinates (deterministic variant)."""
    ih, iw = lab.shape
    cap = len(segs)
    mx00 = np.zeros(cap)
    mx01 = np.zeros(cap)
    mx11 = np.zeros(cap)
    my0 = np.zeros(cap)
    my1 = np.zeros(cap)
    dirx = np.zeros(cap)
    diry = np.zeros(cap)
    for g in range(1, count + 1):
        dirx[g] = np.rint(segs[g].ex - segs[g].sx)
        diry[g] = np.rint(segs[g].ey - segs[g].sy)
    for y in range(ih):
        for x in range(iw):
            g = lab[y, x]
            if g <= 0 or g > count:
                continue
            s = segs[g]
            vx = x - int(np.rint(s.sx))
            vy = y - int(np.rint(s.sy))
            ax0 = vx * dirx[g] + vy * diry[g]
            ay = -vx * diry[g] + vy * dirx[g]
            ax1 = dirx[g] ** 2 + diry[g] ** 2
            mx00[g] += ax0 * ax0
            mx01[g] += ax0 * ax1
            mx11[g] += ax1 * ax1
            my0[g] += ax0 * ay
            my1[g] += ax1 * ay
    for g in range(1, count + 1):
        s = segs[g]
        if s.polyid == 0:
            continue
        rdet = mx00[g] * mx11[g] - mx01[g] * mx01[g]
        if rdet == 0:
            continue
        as0 = (mx11[g] * my0[g] - mx01[g] * my1[g]) / rdet
        as1 = (mx00[g] * my1[g] - mx01[g] * my0[g]) / rdet
        s.sx += -diry[g] * as1
        s.sy += dirx[g] * as1
        s.ex += -diry[g] * (as0 + as1)
        s.ey += dirx[g] * (as0 + as1)

    # snap from pre-snap coordinates
    coords = [(s.sx, s.sy, s.ex, s.ey) for s in segs]
    for g in range(1, count + 1):
        s = segs[g]
        if s.polyid == 0 or s.right == 0:
            continue
        v0, v1, v2, v3 = coords[g]
        u0, u1, u2, u3 = coords[s.right]
        d = (v2 - v0) * (u3 - u1) - (v3 - v1) * (u2 - u0)
        if abs(d) < 1e-6:
            wx, wy = (v2 + u0) * 0.5, (v3 + u1) * 0.5
        else:
            nq = (v1 - u1) * (u2 - u0) - (v0 - u0) * (u3 - u1)
            q = nq / d
            wx, wy = v0 + q * (v2 - v0), v1 + q * (v3 - v1)
            if np.hypot(wx - v2, wy - v3) > 10 and \
                    np.hypot(wx - u0, wy - u1) > 10:
                wx, wy = (v2 + u0) * 0.5, (v3 + u1) * 0.5
        s.ex, s.ey = wx, wy
        segs[s.right].sx, segs[s.right].sy = wx, wy
    return segs
