"""Golden model: CCL, strength/size filters, morphology (loop-level)."""

from __future__ import annotations

import numpy as np

RX = [1, 1, 0, -1, -1, -1, 0, 1]
RY = [0, -1, -1, -1, 0, 1, 1, 1]


def label_components(pix, bgc):
    """8-connected equal-value CCL; label = min flat index of component.

    Union-find oracle for the converged fixpoint of label8xMain
    (oclimgutil.cl:495-538).
    """
    ih, iw = pix.shape
    parent = np.arange(ih * iw)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    for y in range(ih):
        for x in range(iw):
            if pix[y, x] == bgc:
                continue
            p0 = y * iw + x
            for dy, dx in ((0, 1), (1, -1), (1, 0), (1, 1)):
                yy, xx = y + dy, x + dx
                if 0 <= yy < ih and 0 <= xx < iw and pix[yy, xx] == pix[y, x]:
                    union(p0, yy * iw + xx)

    out = np.full(ih * iw, -1, np.int64)
    for y in range(ih):
        for x in range(iw):
            if pix[y, x] != bgc:
                out[y * iw + x] = find(y * iw + x)
    return out.reshape(ih, iw)


def calc_strength(edge, label, scale=10000.0):
    ih, iw = edge.shape
    out = np.zeros(ih * iw, np.int64)
    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            l = label[y, x]
            if l <= 0:
                continue
            out[l] += int(edge[y, x] * edge[y, x] * scale)
    return out


def filter_strength(label, strength, thre):
    ih, iw = label.shape
    out = label.copy()
    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            l = label[y, x]
            if l <= 0 or strength[l] < thre:
                out[y, x] = -1
    return out


# --- morphology ---------------------------------------------------------------

def simple_junction(img, positive_only=False):
    ih, iw = img.shape
    out = np.zeros((ih, iw), np.int64)
    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            c = (img[y, x] > 0) if positive_only else (img[y, x] != 0)
            if not c:
                continue
            count = 1
            for i in range(8):
                v = img[y + RY[i], x + RX[i]]
                if (v > 0) if positive_only else (v != 0):
                    count += 1
            out[y, x] = 0 if count == 1 else count
    return out


def simple_connect_poly(jn):
    """oclpolyline.cl:89-110 with explicit zeroed border."""
    ih, iw = jn.shape
    out = np.zeros((ih, iw), np.int64)
    for y in range(2, ih - 2):
        for x in range(2, iw - 2):
            if jn[y, x] != 0:
                out[y, x] = 1
                continue
            J = jn
            pats = [
                (J[y, x - 2] != 0 and J[y, x - 1] == 2 and J[y, x + 1] == 2 and J[y, x + 2] != 0),
                (J[y - 2, x] != 0 and J[y - 1, x] == 2 and J[y + 1, x] == 2 and J[y + 2, x] != 0),
                (J[y - 2, x - 2] != 0 and J[y - 1, x - 1] == 2 and J[y + 1, x + 1] == 2 and J[y + 2, x + 2] != 0),
                (J[y - 2, x + 2] != 0 and J[y - 1, x + 1] == 2 and J[y + 1, x - 1] == 2 and J[y + 2, x - 2] != 0),
                (J[y, x + 2] != 0 and J[y, x + 1] == 2 and J[y + 1, x - 1] == 2 and J[y + 1, x - 2] != 0),
                (J[y, x - 2] != 0 and J[y, x - 1] == 2 and J[y + 1, x + 1] == 2 and J[y + 1, x + 2] != 0),
                (J[y - 2, x + 1] != 0 and J[y - 1, x + 1] == 2 and J[y + 1, x] == 2 and J[y + 2, x] != 0),
                (J[y - 2, x - 1] != 0 and J[y - 1, x - 1] == 2 and J[y + 1, x] == 2 and J[y + 2, x] != 0),
            ]
            out[y, x] = 1 if any(pats) else 0
    return out


def simple_connect2(conn):
    """Loop-level oracle of the 2-px gap bridging accuracy extension
    (rectdetect_tpu.ops.morphology.simple_connect2 — no reference kernel;
    closes the straight 2-px staircase holes the thinning leaves)."""
    ih, iw = conn.shape
    deg = np.zeros((ih, iw), np.int64)
    for y in range(ih):
        for x in range(iw):
            if conn[y, x] == 0:
                continue
            c = 1
            for i in range(8):
                yy, xx = y + RY[i], x + RX[i]
                if 0 <= yy < ih and 0 <= xx < iw and conn[yy, xx] != 0:
                    c += 1
            deg[y, x] = c

    def d(y, x):
        return deg[y, x] if 0 <= y < ih and 0 <= x < iw else 0

    out = np.zeros((ih, iw), np.int64)
    for y in range(2, ih - 2):
        for x in range(2, iw - 2):
            if conn[y, x] != 0:
                out[y, x] = 1
                continue
            hit = False
            for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
                if d(y - dy, x - dx) == 2 and d(y + 2 * dy, x + 2 * dx) == 2:
                    hit = True
                if d(y - 2 * dy, x - 2 * dx) == 2 and d(y + dy, x + dx) == 2:
                    hit = True
            out[y, x] = 1 if hit else 0
    return out


def rescue_filtered(pre_label, filtered, rounds=3):
    """Loop-level oracle of ccl.rescue_filtered."""
    ih, iw = pre_label.shape
    out = filtered.copy()
    for _ in range(rounds):
        nxt = out.copy()
        for y in range(ih):
            for x in range(iw):
                if pre_label[y, x] <= 0 or out[y, x] > 0:
                    continue
                for i in range(8):
                    yy, xx = y + RY[i], x + RX[i]
                    if 0 <= yy < ih and 0 <= xx < iw and out[yy, xx] > 0:
                        nxt[y, x] = pre_label[y, x]
                        break
        out = nxt
    return out


def stringify(img, parity):
    ih, iw = img.shape
    out = img.copy()
    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            if ((x + y) & 1) != parity:
                continue
            if ((img[y - 1, x] != 0 and img[y, x - 1] != 0) or
                    (img[y - 1, x] != 0 and img[y, x + 1] != 0) or
                    (img[y + 1, x] != 0 and img[y, x - 1] != 0) or
                    (img[y + 1, x] != 0 and img[y, x + 1] != 0)):
                out[y, x] = 0
    return out


def remove_branch(img):
    ih, iw = img.shape
    out = np.zeros((ih, iw), np.int64)
    for y in range(1, ih - 1):
        for x in range(1, iw - 1):
            if img[y, x] == 0:
                continue
            count = sum(1 for i in range(8) if img[y + RY[i], x + RX[i]] != 0)
            out[y, x] = 1 if count <= 2 else 0
    return out


def simple_connect_rect(jn):
    """The oclrect.cl:97-121 bridging variant (loop-level oracle)."""
    ih, iw = jn.shape
    out = np.zeros((ih, iw), np.int64)
    for y in range(2, ih - 2):
        for x in range(2, iw - 2):
            if jn[y, x] != 0:
                out[y, x] = 1
                continue
            n = lambda dy, dx: jn[y + dy, x + dx]
            if n(0, -1) == 2 and n(0, 1) != 0: out[y, x] = 1
            if n(0, -1) != 0 and n(0, 1) == 2: out[y, x] = 1
            if n(-1, 0) == 2 and n(1, 0) != 0: out[y, x] = 1
            if n(-1, 0) != 0 and n(1, 0) == 2: out[y, x] = 1
            if n(-1, -1) == 2 and n(1, 1) == 2: out[y, x] = 1
            if n(-1, 1) == 2 and n(1, -1) == 2: out[y, x] = 1
            if n(0, 1) == 2 and n(1, -1) == 2: out[y, x] = 1
            if n(0, -1) == 2 and n(1, 1) == 2: out[y, x] = 1
            if n(-1, 1) == 2 and n(1, 0) == 2: out[y, x] = 1
            if n(-1, -1) == 2 and n(1, 0) == 2: out[y, x] = 1
    return out
