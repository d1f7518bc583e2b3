"""Golden model of the rect-pipeline region stages (oclrect.cl:155-390).

Loop-level NumPy oracle operating on packed-Lab int32 planes like the
device code.  Deterministic where the reference is scheduling-dependent
(labelMerge converges to the same fixpoint; despeckle/despeckle2 pick
first-best in scan order, which the kernels do too)."""

from __future__ import annotations

import numpy as np

BLBLURSIZE = 4


def unpack_int(p):
    return p & 4095, (p >> 12) & 1023, (p >> 22) & 1023


def pack_int(cl, ca, cb):
    cl = int(min(max(cl, 0), 4095))
    ca = int(min(max(ca, 0), 1023))
    cb = int(min(max(cb, 0), 1023))
    return (cb << 22) | (ca << 12) | cl


def unpack_f(p):
    cl, ca, cb = unpack_int(p)
    return np.array([(cl + 0.5) / 4096.0, (ca + 0.5) / 1024.0,
                     (cb + 0.5) / 1024.0], np.float32)


def blblur0(packed, edge):
    """Horizontal edge-limited blur (oclrect.cl:155-179)."""
    ih, iw = packed.shape
    out = packed.copy()
    for y in range(ih):
        for x in range(iw):
            oe = edge[y, x] != 0
            wsum = 0
            csum = np.zeros(3, np.int64)
            for xx in range(0, -BLBLURSIZE - 1, -1):
                if x + xx < 0:
                    break
                if x + xx > 0 and edge[y, x + xx] != 0 and \
                        edge[y, x + xx - 1] == 0:
                    break
                if x + xx > 0 and y < ih - 1 and edge[y, x + xx] == 0 and \
                        edge[y, x + xx - 1] != 0 and edge[y + 1, x + xx] != 0:
                    break
                wsum += 1
                csum += unpack_int(packed[y, x + xx])
            for xx in range(0, BLBLURSIZE + 1):
                if x + xx > iw - 1:
                    break
                if x + xx < iw - 1 and edge[y, x + xx] == 0 and \
                        edge[y, x + xx + 1] != 0:
                    break
                if oe and edge[y, x + xx] == 0:
                    break
                wsum += 1
                csum += unpack_int(packed[y, x + xx])
            if wsum:
                c = csum // wsum
                out[y, x] = pack_int(c[0], c[1], c[2])
    return out


def blblur1(packed, edge):
    """Vertical edge-limited blur (oclrect.cl:181-205)."""
    ih, iw = packed.shape
    out = packed.copy()
    for y in range(ih):
        for x in range(iw):
            oe = edge[y, x] != 0
            wsum = 0
            csum = np.zeros(3, np.int64)
            for yy in range(0, -BLBLURSIZE - 1, -1):
                if y + yy < 0:
                    break
                if y + yy > 0 and edge[y + yy, x] != 0 and \
                        edge[y + yy - 1, x] == 0:
                    break
                if y + yy > 0 and x < iw - 1 and edge[y + yy, x] == 0 and \
                        edge[y + yy - 1, x] != 0 and edge[y + yy, x + 1] != 0:
                    break
                wsum += 1
                csum += unpack_int(packed[y + yy, x])
            for yy in range(0, BLBLURSIZE + 1):
                if y + yy > ih - 1:
                    break
                if y + yy < ih - 1 and edge[y + yy, x] == 0 and \
                        edge[y + yy + 1, x] != 0:
                    break
                if oe and edge[y + yy, x] == 0:
                    break
                wsum += 1
                csum += unpack_int(packed[y + yy, x])
            if wsum:
                c = csum // wsum
                out[y, x] = pack_int(c[0], c[1], c[2])
    return out


def quantize(packed, n=24):
    ih, iw = packed.shape
    out = np.zeros_like(packed)
    for y in range(ih):
        for x in range(iw):
            v = unpack_f(packed[y, x])
            q = np.floor(v * n + 0.5) / n
            out[y, x] = pack_int(int(np.floor(q[0] * 4096)),
                                 int(np.floor(q[1] * 1024)),
                                 int(np.floor(q[2] * 1024)))
    return out


def despeckle(packed, edge_mag):
    ih, iw = packed.shape
    out = packed.copy()
    for y in range(ih):
        for x in range(iw):
            if edge_mag[y, x] < 1e-6:
                continue
            dist = 1e10
            lab0 = unpack_f(packed[y, x])
            for yy in (-1, 0, 1):
                for xx in (-1, 0, 1):
                    if not (0 <= x + xx < iw and 0 <= y + yy < ih):
                        continue
                    if edge_mag[y + yy, x + xx] >= 1e-6:
                        continue
                    d = np.sqrt(np.sum(
                        (unpack_f(packed[y + yy, x + xx]) - lab0) ** 2))
                    if d < dist:
                        out[y, x] = packed[y + yy, x + xx]
                        dist = d
    return out


def merge_mask(junction):
    """mkMergeMask0/1 (oclrect.cl:246-287)."""
    ih, iw = junction.shape
    out = np.zeros((ih, iw), np.int64)
    for y in range(ih):
        for x in range(iw):
            if junction[y, x] != 0:
                for yy in range(y - 6, y + 7):
                    for xx in range(x - 6, x + 7):
                        if 0 <= xx < iw and 0 <= yy < ih and \
                                16 <= (yy - y) ** 2 + (xx - x) ** 2 < 36:
                            out[yy, xx] = 1
    for y in range(ih):
        for x in range(iw):
            if junction[y, x] == 2:
                for yy in range(y - 8, y + 9):
                    for xx in range(x - 8, x + 9):
                        if 0 <= xx < iw and 0 <= yy < ih and \
                                (yy - y) ** 2 + (xx - x) ** 2 < 64:
                            out[yy, xx] = 0
            elif junction[y, x] != 0:
                for yy in range(y - 4, y + 5):
                    for xx in range(x - 4, x + 5):
                        if 0 <= xx < iw and 0 <= yy < ih and \
                                (yy - y) ** 2 + (xx - x) ** 2 < 16:
                            out[yy, xx] = 0
    return out


def label_merge(packed, mask, edge_label):
    """Converged fixpoint of labelMergeMain via union-find with the
    asymmetric edge rules (oclrect.cl:300-334): p0 merges up/left only if
    p0 is not a strong-edge pixel; merges right/down only if the neighbor
    is not one."""
    ih, iw = packed.shape
    parent = np.arange(ih * iw)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # preprocess seeding links every equal up/left pair unconditionally
    # (labelxPreprocess, oclrect.cl:289-298)
    for y in range(ih):
        for x in range(iw):
            p0 = y * iw + x
            if y > 0 and packed[y, x] == packed[y - 1, x]:
                union(p0, p0 - iw)
            elif x > 0 and packed[y, x] == packed[y, x - 1]:
                union(p0, p0 - 1)

    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            p0 = y * iw + x
            ok_here = edge_label[y, x] <= 0
            for dy, dx, edge_at_nb in ((-1, 0, False), (0, -1, False),
                                       (0, 1, True), (1, 0, True)):
                p1 = (y + dy) * iw + (x + dx)
                same = (packed[y + dy, x + dx] == packed[y, x]) or \
                    mask[y, x] != 0
                blk = (edge_label[y + dy, x + dx] > 0) if edge_at_nb \
                    else (not ok_here)
                if same and not blk:
                    union(p0, p1)

    out = np.array([find(p) for p in range(ih * iw)])
    return out.reshape(ih, iw)


def label_sizes(label):
    ih, iw = label.shape
    out = np.zeros(ih * iw, np.int64)
    for p in label.flatten():
        out[p] += 1
    return out


def despeckle2(label, sizes, thre=16):
    ih, iw = label.shape
    out = label.copy()
    for y in range(ih):
        for x in range(iw):
            if sizes[label[y, x]] > thre:
                continue
            max_size, max_label = 0, label[y, x]
            for yy in (-1, 0, 1):
                for xx in (-1, 0, 1):
                    if 0 <= x + xx < iw and 0 <= y + yy < ih:
                        s = sizes[label[y + yy, x + xx]]
                        if s > max_size:
                            max_size = s
                            max_label = label[y + yy, x + xx]
            out[y, x] = max_label
    return out


def mark_boundary(label):
    ih, iw = label.shape
    out = np.full((ih, iw), -1, np.int64)
    for y in range(2, ih - 2):
        for x in range(2, iw - 2):
            c0 = label[y, x]
            near = False
            for yy in range(-2, 3):
                for xx in range(-2, 3):
                    if label[y + yy, x + xx] != c0:
                        near = True
            out[y, x] = c0 if near else -1
    return out
