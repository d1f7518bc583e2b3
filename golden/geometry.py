"""Golden model of the reference's CPU geometry stage (oclrect.c:385-1226).

Float64 loop-level port: quickHull, Cohen-Sutherland clipping, the
hypothesis reduction chain (removeShortLS -> pickExternalLS ->
pickLongestLS -> sortByAngle -> findCorners -> checks) and the CG pose
estimator with the reference's central-difference derivatives."""

from __future__ import annotations

import math

import numpy as np

EPS = 1e-6
INIT_SCALE = 1.0


# ---------------------------------------------------------------- pose ----

def value(v, points, mode):
    """Objective (oclrect.c:441-477). v: (4,), points: (4,3)."""
    q = points * v[:, None]

    def dsq(i, j):
        d = q[i] - q[j]
        return float(np.dot(d, d))

    l01, l12, l23, l03 = dsq(0, 1), dsq(1, 2), dsq(2, 3), dsq(0, 3)
    l02, l13 = dsq(0, 2), dsq(1, 3)

    score = ((l23 if mode else l03) - 1.0) ** 2
    score += ((l01 if mode else l12) - 1.0) ** 2
    comp = 1.0 / (l12 if mode else l01)

    a = (q[0] if mode else q[2]) - q[1]
    b = (q[2] if mode else q[0]) - q[3]
    score += float(np.dot(a + b, a + b))
    c = q[1] - (q[2] if mode else q[0])
    d = q[3] - (q[0] if mode else q[2])
    score += comp * float(np.dot(c + d, c + d))

    score += (l01 + l12 - l02) ** 2
    score += (l03 + l23 - l02) ** 2
    score += (l01 + l03 - l13) ** 2
    score += (l12 + l23 - l13) ** 2

    n013 = np.cross(q[1] - q[0], q[3] - q[0])
    score += comp * (np.dot(n013, q[2]) - np.dot(n013, q[0])) ** 2 / \
        np.dot(n013, n013)
    n102 = np.cross(q[0] - q[1], q[2] - q[1])
    score += comp * (np.dot(n102, q[3]) - np.dot(n102, q[1])) ** 2 / \
        np.dot(n102, n102)
    return score


def gradient_dir(v, direction, points, mode):
    """(f, f', f'') along direction (gradient, oclrect.c:479-490)."""
    h = EPS
    f0 = value(v, points, mode)
    fp = value(v + direction * h, points, mode)
    fm = value(v - direction * h, points, mode)
    return f0, (fp - fm) / (2 * h), (fp + fm - 2 * f0) / (h * h)


def gradient2(v, points, mode):
    """(grad, diag hess) by central differences (oclrect.c:492-512)."""
    fx = value(v, points, mode)
    a = np.zeros(4)
    a2 = np.zeros(4)
    for i in range(4):
        d = np.zeros(4)
        d[i] = EPS
        fm = value(v - d, points, mode)
        fp = value(v + d, points, mode)
        a[i] = (fp - fm) / (2 * EPS)
        a2[i] = (fm - 2 * fx + fp) / (EPS * EPS)
    return a, a2


def line_search(iv, direction, n_iter, points, mode):
    d = direction / np.linalg.norm(direction)
    scale = INIT_SCALE
    for _ in range(n_iter):
        f0, g1, g2 = gradient_dir(iv, d, points, mode)
        if g2 * g2 < 1e-10:
            g2 = 1.0
        delta = abs(g1 / g2)
        if delta < 1e-10:
            return iv
        v = iv + d * (delta * scale)
        if value(v, points, mode) > f0:
            scale *= 0.5
            continue
        iv = v
    return iv


def inversedot(m, r):
    if np.all(m > 0):
        return r / m
    return r


def cgexecute(iv, loop_cnt, n_iter2, points, mode):
    x = iv.copy()
    g, m = gradient2(x, points, mode)
    r = -g
    s = inversedot(m, r)
    d = s
    deltanew = float(np.dot(r, d))
    k = 0
    for _ in range(loop_cnt):
        x = line_search(x, d, n_iter2, points, mode)
        g, m = gradient2(x, points, mode)
        r = -g
        deltaold = deltanew
        deltamid = float(np.dot(r, s))
        s = inversedot(m, r)
        deltanew = float(np.dot(r, s))
        beta = (deltanew - deltamid) / deltaold if deltaold != 0 else 0.0
        if k == 10 or beta <= 0 or deltaold == 0:
            d = s
            k = 0
        else:
            d = s + d * beta
        k += 1
    return x


def pose_estimation(corners, iw, ih, tan_aov):
    """poseEstimation (oclrect.c:590-634).  corners: (4,2) ordered quad
    corner points (edge i = corners[i]->corners[i+1]).  gv = mean corner."""
    corners = np.asarray(corners, np.float64)
    e0 = corners
    e1 = np.roll(corners, -1, axis=0)
    gv = corners.mean(axis=0)

    best, tl = 1e100, 0
    for i in range(4):
        v = e1[i] - e0[i]
        v = v / np.linalg.norm(v)
        v = np.array([-v[1], v[0]])
        if np.dot(e0[i] - gv, v) < 0:
            v = -v
        if v[1] < best:
            best, tl = v[1], i

    p = np.zeros((4, 3))
    c2 = np.zeros((4, 2))
    for i in range(4):
        c2[i] = e0[(i + tl) & 3]
        q = np.array([c2[i][0] - iw / 2, -(c2[i][1] - ih / 2),
                      (iw / 2) / tan_aov])
        p[i] = q / np.linalg.norm(q)

    d01 = 1.0 / np.linalg.norm(p[0] - p[1])
    d23 = 1.0 / np.linalg.norm(p[2] - p[3])
    x0 = cgexecute(np.array([d01, d01, d23, d23]), 12, 10, p, 1)
    v0 = value(x0, p, 1)

    d12 = 1.0 / np.linalg.norm(p[1] - p[2])
    d03 = 1.0 / np.linalg.norm(p[0] - p[3])
    x1 = cgexecute(np.array([d03, d12, d12, d03]), 12, 10, p, 0)
    v1 = value(x1, p, 0)

    val = min(v0, v1)
    x = x0 if v0 < v1 else x1
    if x[0] < 0:
        x = -x
    c3 = p * x[:, None]
    return c2, c3, val


def closest_point_ls(v, w, p):
    d = w - v
    l2 = float(np.dot(d, d))
    if l2 == 0:
        return v
    t = float(np.dot(p - v, d)) / l2
    t = min(max(t, 0.0), 1.0)
    return v + t * d


def looks_like_a_screen(c2, c3, val):
    if val > 0.05:
        return False
    if np.any(c3[:, 2] < 0):
        return False
    asp = np.linalg.norm(c3[0] - c3[1]) / np.linalg.norm(c3[1] - c3[2])
    if asp < 1 / 12 or asp > 12:
        return False
    maxs, mins = 0.0, 1e100
    for i in range(4):
        s0 = np.sum((c2[(i + 2) % 4] - closest_point_ls(
            c2[i], c2[(i + 1) % 4], c2[(i + 2) % 4])) ** 2)
        s1 = np.sum((c2[(i + 3) % 4] - closest_point_ls(
            c2[i], c2[(i + 1) % 4], c2[(i + 3) % 4])) ** 2)
        maxs = max(maxs, max(s0, s1))
        mins = min(mins, max(s0, s1))
    return maxs / mins <= 100


# --------------------------------------------------------------- quads ----

def closest_point(v, w, p):
    d = w - v
    l2 = float(np.dot(d, d))
    if l2 == 0:
        return v.copy()
    t = float(np.dot(p - v, d)) / l2
    return v + t * d


def quick_hull(points):
    """quickHull2 (oclrect.c:697-734); returns hull vertices in order."""
    pts = [np.asarray(p, np.float64) for p in points]
    if not pts:
        return []
    v_right = max(pts, key=lambda p: p[0])
    v_left = min(pts, key=lambda p: p[0])
    v_top = np.array([v_left[1] - v_right[1], v_right[0] - v_left[0]])

    s_top, s_bot = [], []
    for p in pts:
        if (p == v_left).all() or (p == v_right).all():
            continue
        if np.dot(p - v_left, v_top) > 0:
            s_top.append(p)
        else:
            s_bot.append(p)

    hull = []

    def find_hull(s, vl, vr):
        if not s:
            return
        far, d = None, 0.0
        for p in s:
            e = float(np.sum((closest_point(vl, vr, p) - p) ** 2))
            if far is None or e > d:
                far, d = p, e
        if d < 0.01 or far is None:
            return
        v_tr = np.array([far[1] - vr[1], vr[0] - far[0]])
        v_tl = np.array([vl[1] - far[1], far[0] - vl[0]])
        s_tr = [p for p in s if p is not far and np.dot(p - far, v_tr) > 0]
        s_tl = [p for p in s if p is not far and np.dot(p - far, v_tl) > 0]
        find_hull(s_tr, far, vr)
        hull.append(far)
        find_hull(s_tl, vl, far)

    hull.append(v_right)
    find_hull(s_top, v_left, v_right)
    hull.append(v_left)
    find_hull(s_bot, v_right, v_left)
    return hull


def clip_line(x0, y0, x1, y1, xmin, ymin, xmax, ymax):
    """Cohen-Sutherland (clipLineWithRect, oclrect.c:758-802)."""
    def code(x, y):
        c = 0
        if x < xmin:
            c |= 1
        if x > xmax:
            c |= 2
        if y < ymin:
            c |= 4
        if y > ymax:
            c |= 8
        return c

    c0, c1 = code(x0, y0), code(x1, y1)
    while True:
        if (c0 | c1) == 0:
            return (x0, y0, x1, y1)
        if (c0 & c1) != 0:
            return None
        out = c0 if c0 else c1
        if out & 8:
            x = x0 + (x1 - x0) * (ymax - y0) / (y1 - y0)
            y = ymax
        elif out & 4:
            x = x0 + (x1 - x0) * (ymin - y0) / (y1 - y0)
            y = ymin
        elif out & 2:
            y = y0 + (y1 - y0) * (xmax - x0) / (x1 - x0)
            x = xmax
        else:
            y = y0 + (y1 - y0) * (xmin - x0) / (x1 - x0)
            x = xmin
        if out == c0:
            x0, y0, c0 = x, y, code(x, y)
        else:
            x1, y1, c1 = x, y, code(x, y)


def _sq_len(ls):
    return float(np.sum((ls[0] - ls[1]) ** 2))


def remove_short_ls(als, ratio=0.05):
    """removeShortLS (oclrect.c:926-943)."""
    if len(als) <= 4:
        return als
    als = sorted(als, key=_sq_len)
    longest = _sq_len(als[-1])
    while len(als) > 4 and _sq_len(als[0]) / longest <= ratio * ratio:
        als.pop(0)
    return als


def pick_external_ls(als):
    """pickExternalLS (oclrect.c:945-992)."""
    plist = []
    for e0, e1 in als:
        plist.append(e0)
        plist.append(e1)
    q = quick_hull(plist)
    als = list(als)
    als2 = []
    DTHRE0, ATHRE1, DTHRE1 = 1.0, 0.95, 0.01
    for i in range(len(q)):
        q0, q1 = q[i], q[(i + 1) % len(q)]
        m = (q0 + q1) * 0.5
        nq01 = (q0 - q1) / np.linalg.norm(q0 - q1)
        als.sort(key=_sq_len)
        last = -1
        for j in range(len(als) - 1, -1, -1):
            e0, e1 = als[j]
            cp = closest_point_ls(e0, e1, m)
            if float(np.sum((m - cp) ** 2)) < DTHRE0:
                als2.append(als[j])
                last = j
                break
            de = (e0 - e1) / np.linalg.norm(e0 - e1)
            if abs(float(np.dot(nq01, de))) > ATHRE1 and \
                    float(np.sum((m - cp) ** 2)) / \
                    float(np.sum((q0 - q1) ** 2)) < DTHRE1:
                als2.append(als[j])
                last = j
                break
        if last != -1:
            als.pop(last)
    return als2


def sum_length(als):
    return sum(math.sqrt(_sq_len(ls)) for ls in als)


def pick_longest_ls(als, n=4):
    if len(als) <= n:
        return als
    als = sorted(als, key=_sq_len)
    return als[::-1][:n]


def gv_of(als):
    g = np.zeros(2)
    lensum = 0.0
    for e0, e1 in als:
        ln = math.sqrt(_sq_len((e0, e1)))
        g += (e0 + e1) * ln
        lensum += ln
    return g * (0.5 / lensum)


def sort_by_angle(als, gv):
    def angle(ls):
        e0, e1 = ls
        v = e0 - e1
        v = np.array([v[1], -v[0]])
        if np.dot(v, e0 - gv) < 0:
            v = -v
        return math.atan2(v[0], v[1])
    return sorted(als, key=angle)


def intersection(u, v):
    """intersection2 (oclrect.c:418-425); u, v: (e0, e1) pairs."""
    d = (v[1][0] - v[0][0]) * (u[1][1] - u[0][1]) - \
        (v[1][1] - v[0][1]) * (u[1][0] - u[0][0])
    if abs(d) < 1e-4:
        return None
    n = (v[0][1] - u[0][1]) * (u[1][0] - u[0][0]) - \
        (v[0][0] - u[0][0]) * (u[1][1] - u[0][1])
    q = n / d
    return np.array([v[0][0] + q * (v[1][0] - v[0][0]),
                     v[0][1] + q * (v[1][1] - v[0][1])])


def find_corners(als):
    c = []
    for i in range(len(als)):
        w = intersection(als[i], als[(i + 1) % len(als)])
        if w is None:
            return None
        c.append(w)
    return [(c[i], c[(i + 1) % len(c)]) for i in range(len(c))]


def close_to_triangle(als, ratio=0.001):
    for i in range(len(als)):
        ls0 = als[i]
        ls1 = als[(i + 1) % len(als)]
        d0 = float(np.sum((ls0[1] - closest_point(ls0[0], ls1[1],
                                                  ls0[1])) ** 2))
        d1 = float(np.sum((ls0[0] - ls1[1]) ** 2))
        if d0 / d1 < ratio:
            return True
    return False


def is_convex(als):
    def c(i):
        return als[i][1] - als[i][0]
    sign = (c(0)[0] * c(1)[1] - c(0)[1] * c(1)[0]) > 0
    for i in range(1, len(als)):
        d0 = c(i)
        d1 = als[(i + 1) % len(als)][1] - als[(i + 1) % len(als)][0]
        if sign != ((d0[0] * d1[1] - d0[1] * d1[0]) > 0):
            return False
    return True


def reduce_group(als):
    """The shared reduction chain (oclrect.c:1134-1151).  als: list of
    (e0, e1).  Returns (corner segments, gv) or None on rejection."""
    als = [(np.asarray(a, np.float64), np.asarray(b, np.float64))
           for a, b in als]
    als = remove_short_ls(als, 0.05)
    als = pick_external_ls(als)
    len0 = sum_length(als)
    als = pick_longest_ls(als, 4)
    if len(als) < 4 or len0 == 0:
        return None
    als = sort_by_angle(als, gv_of(als))
    als = find_corners(als)
    if als is None:
        return None
    len1 = sum_length(als)
    if close_to_triangle(als, 0.001) or len(als) < 4 or len1 / len0 > 2 \
            or not is_convex(als):
        return None
    return als
