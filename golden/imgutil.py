"""Golden model: color, gradient, edge, thinning (oclimgutil.cl semantics)."""

from __future__ import annotations

import numpy as np

# --- color -----------------------------------------------------------------

_M_RGB2XYZ = np.array([[0.412453, 0.357580, 0.180423],
                       [0.212671, 0.715160, 0.072169],
                       [0.019334, 0.119193, 0.950227]])
_XN, _ZN = 0.950456, 1.088754


def srgb_to_linear(u8):
    s = np.asarray(u8, dtype=np.float64) / 255.0
    return np.where(s <= 0.04045, s / 12.92, ((s + 0.055) / 1.055) ** 2.4)


def _lab_f(t):
    return np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 16.0 / 116.0)


def bgr_to_labf(bgr):
    """(H,W,3) uint8 BGR -> normalized Lab floats (float64)."""
    rgb = np.stack([srgb_to_linear(bgr[..., 2]),
                    srgb_to_linear(bgr[..., 1]),
                    srgb_to_linear(bgr[..., 0])], axis=-1)
    xyz = rgb @ _M_RGB2XYZ.T
    x = xyz[..., 0] / _XN
    y = xyz[..., 1]
    z = xyz[..., 2] / _ZN
    fx, fy, fz = _lab_f(x), _lab_f(y), _lab_f(z)
    lstar = np.where(y > 0.008856, 116.0 * fy - 16.0, 903.3 * y)
    astar = 500.0 * (fx - fy)
    bstar = 200.0 * (fy - fz)
    return np.stack([lstar / 256.0, (astar + 128.0) / 256.0,
                     (bstar + 128.0) / 256.0], axis=-1)


def quantize_labf(labf):
    scale = np.array([4096.0, 1024.0, 1024.0])
    hi = np.array([4095.0, 1023.0, 1023.0])
    q = np.clip(np.floor(labf * scale), 0, hi)
    return (q + 0.5) / scale


# --- boundary helpers --------------------------------------------------------

def mirror1(x, n):
    """clamp(x, -x, 2n-2-x) — reflect-101 (oclimgutil.cl:47-49)."""
    x = int(x)
    if x < -x:
        x = -x
    hi = 2 * n - 2 - x
    if x > hi:
        x = hi
    return x


def at(img, x, y):
    ih, iw = img.shape[:2]
    return img[mirror1(y, ih), mirror1(x, iw)]


# --- edgevec / edge ----------------------------------------------------------

# float32 like the device (the whole kernel pipeline is `float`;
# f64 oracles flip NMS decisions on weak edges vs real behavior)
V5C = np.array([
    [-4.667, -4.083, 0.000, 4.083, 4.667],
    [-10.024, -0.963, 0.000, 0.963, 10.024],
    [-14.120, 3.622, 0.000, -3.622, 14.120],
    [-10.024, -0.963, 0.000, 0.963, 10.024],
    [-4.667, -4.083, 0.000, 4.083, 4.667],
], np.float32)


def edgevec(img):
    """oclimgutil.cl:395-420 (edgevec_f), float32 like the device."""
    img = np.asarray(img, np.float32)
    ih, iw = img.shape
    out = np.zeros((ih, iw, 2), np.float32)
    for y in range(ih):
        for x in range(iw):
            vx = vy = np.float32(0.0)
            for yy in range(-2, 3):
                for xx in range(-2, 3):
                    s = at(img, x + xx, y + yy)
                    vx += V5C[yy + 2, xx + 2] * s
                    vy += V5C[xx + 2, yy + 2] * s
            ivlen = vx * vx + vy * vy
            if ivlen > np.float32(1e-10):
                r = np.float32(1.0) / np.sqrt(ivlen)
                out[y, x] = (vx * r, vy * r)
            else:
                out[y, x] = (0.70710678118, 0.70710678118)
    return out


def edgevec_lab(labf):
    """oclimgutil.cl:354-393 (edgevec_plab)."""
    ih, iw = labf.shape[:2]
    out = np.zeros((ih, iw, 2))
    for y in range(ih):
        for x in range(iw):
            vx3 = np.zeros(3)
            vy3 = np.zeros(3)
            for yy in range(-2, 3):
                for xx in range(-2, 3):
                    s = at(labf, x + xx, y + yy)
                    vx3 += V5C[yy + 2, xx + 2] * s
                    vy3 += V5C[xx + 2, yy + 2] * s
            e3 = vx3 * vx3 + vy3 * vy3
            if e3[0] >= e3[1] and e3[0] >= e3[2]:
                ivlen, vx, vy = e3[0], vx3[0], vy3[0]
            elif e3[1] >= e3[2]:
                ivlen, vx, vy = e3[1], vx3[1], vy3[1]
            else:
                ivlen, vx, vy = e3[2], vx3[2], vy3[2]
            if e3[0] >= 1e-6 and (vx3[0] * vx + vy3[0] * vy) < 0:
                vx, vy = -vx, -vy
            if ivlen > 1e-10:
                r = 1.0 / np.sqrt(ivlen)
                vx, vy = vx * r, vy * r
            else:
                vx = vy = 0.70710678118
            out[y, x] = (vx, vy)
    return out


def edge(img):
    """oclimgutil.cl:439-452 (edge_f_f)."""
    ih, iw = img.shape
    out = np.zeros((ih, iw))
    for y in range(ih):
        for x in range(iw):
            t = (at(img, x, y - 1) + at(img, x - 1, y)
                 - at(img, x, y + 1) - at(img, x + 1, y))
            s = (at(img, x - 1, y - 1) - at(img, x + 1, y + 1)) * t
            t = (at(img, x, y - 1) - at(img, x - 1, y)
                 + at(img, x + 1, y) - at(img, x, y + 1))
            s += (at(img, x + 1, y - 1) - at(img, x - 1, y + 1)) * t
            out[y, x] = np.sqrt(max(0.0, s))
    return out


def edge_lab(labf):
    """oclimgutil.cl:422-437 (edge_plab): per-channel clamp then sum,
    float32 like the device."""
    labf = np.asarray(labf, np.float32)
    ih, iw = labf.shape[:2]
    out = np.zeros((ih, iw), np.float32)
    for y in range(ih):
        for x in range(iw):
            total = np.float32(0.0)
            for c in range(3):
                ch = labf[..., c]
                t = (at(ch, x, y - 1) + at(ch, x - 1, y)
                     - at(ch, x, y + 1) - at(ch, x + 1, y))
                s = (at(ch, x - 1, y - 1) - at(ch, x + 1, y + 1)) * t
                t = (at(ch, x, y - 1) - at(ch, x - 1, y)
                     + at(ch, x + 1, y) - at(ch, x, y + 1))
                s += (at(ch, x + 1, y - 1) - at(ch, x - 1, y + 1)) * t
                total += max(np.float32(0.0), s)
            out[y, x] = np.sqrt(total) if total > 0 else np.float32(0.0)
    return out


# --- bicubic + thinning -------------------------------------------------------

def _bicubic_sub(p0, p1, p2, p3, x):
    v = p1 - p2
    w = p3 - p0
    u = v * 3.0 + w
    u = u * x + (-4.0 * v + (p0 - p1 - w))
    u = u * x + (p2 - p0)
    u = u * x * 0.5 + p1
    return u


def bicubic(img, x, y):
    """oclimgutil.cl:87-94: ix = (int)x (truncation), mirror taps."""
    ix, iy = int(x), int(y)  # trunc toward zero, as in C
    rows = []
    for dy in range(-1, 3):
        rows.append(_bicubic_sub(at(img, ix - 1, iy + dy), at(img, ix, iy + dy),
                                 at(img, ix + 1, iy + dy), at(img, ix + 2, iy + dy),
                                 x - ix))
    return _bicubic_sub(rows[0], rows[1], rows[2], rows[3], y - iy)


def thinthres(edge_img, vec):
    """oclimgutil.cl:456-471 (thinthres_f_f_f2), float32 like the
    device."""
    edge_img = np.asarray(edge_img, np.float32)
    vec = np.asarray(vec, np.float32)
    ih, iw = edge_img.shape
    out = np.zeros((ih, iw))
    for y in range(ih):
        for x in range(iw):
            vx, vy = vec[y, x]
            am2 = bicubic(edge_img, x - 2 * vx, y - 2 * vy)
            am1 = bicubic(edge_img, x - 1 * vx, y - 1 * vy)
            a0 = edge_img[y, x]
            ap1 = bicubic(edge_img, x + 1 * vx, y + 1 * vy)
            ap2 = bicubic(edge_img, x + 2 * vx, y + 2 * vy)
            if am1 <= a0 and a0 >= ap1:
                out[y, x] = am2 + am1 + a0 + ap1 + ap2
    return out


def srgb2plab_exact(bgr):
    """Loop-level mirror of the reference's fixed-point LUT conversion
    (srgb2plab, oclimgutil.cl:106-134), tables from core/luts.py."""
    from rectdetect_tpu.core.luts import (cfunc2_table, cfunc_table,
                                          s2l_table)
    s2l = s2l_table().astype(np.int64)
    cfunc = cfunc_table().astype(np.int64)
    cfunc2 = cfunc2_table().astype(np.int64)
    h, w, _ = bgr.shape
    out = np.zeros((h, w), np.int32)

    def k(c):
        return int(c * 16384 + 0.5)

    kxn = int(32768 / 0.950456 + 0.5)
    kzn = int(32768 / 1.088754 + 0.5)

    def interp(tbl, c):
        return tbl[c >> 8] * (256 - (c & 255)) + tbl[(c >> 8) + 1] * (c & 255)

    for y in range(h):
        for x in range(w):
            ib, ig, ir = (int(s2l[bgr[y, x, 0]]), int(s2l[bgr[y, x, 1]]),
                          int(s2l[bgr[y, x, 2]]))
            cx = ((((ir * k(0.412453) + ig * k(0.357580) + ib * k(0.180423)
                     + (1 << 14)) >> 15) * kxn) + (1 << 10)) >> 11
            cy = ((ir * k(0.212671) + ig * k(0.715160) + ib * k(0.072169))
                  + (1 << 10)) >> 11
            cz = ((((ir * k(0.019334) + ig * k(0.119193) + ib * k(0.950227)
                     + (1 << 14)) >> 15) * kzn) + (1 << 10)) >> 11
            cl = ((int(interp(cfunc2, cy)) >> 12) + 1) >> 1
            fx = int(interp(cfunc, cx))
            fy = int(interp(cfunc, cy))
            fz = int(interp(cfunc, cz))
            fxy = (fx - fy + (1 << 7)) >> 8
            fyz = (fy - fz + (1 << 7)) >> 8
            ca = (fxy * 8031 + (134744072 + (1 << 17))) >> 18
            cb = (fyz * 3213 + (134744072 + (1 << 17))) >> 18
            v = ((min(max(cb, 0), 1023) << 22)
                 | (min(max(ca, 0), 1023) << 12)
                 | min(max(cl, 0), 4095))
            out[y, x] = v - (1 << 32) if v >= (1 << 31) else v
    return out


# --- recursive Gaussian blur (iirblur) ---------------------------------------
#
# Loop-level transcription of the 6-kernel iirblur chain
# (oclimgutil.cl:542-637): per row/column an 8-feed-forward /
# 7-feedback float32 recurrence run once left->right and once
# right->left, combined as t_fwd + t_bwd - in*coef[0]; then the same
# vertically.  The scan warms up (r+1+8) samples outside the frame on
# reflect-101 (mirror1) samples with zero initial state; warmup writes
# land at repeat1() positions and are overwritten by in-frame writes.
# Only the r=2 coefficient row is transcribed (the pipeline always runs
# r=2, oclrect.c:248-250); iircoef[32][15] lives at oclimgutil.cl:900-1125.

# NOTE: the kernel indexes `iircoef[r]` ZERO-based while the table rows
# carry 1-based `// k` comments, so r=2 selects the row labeled "// 3"
# (sigma ~ 1.0), not "// 2" — the device's effective sigma for the
# pipeline's r=2 is (r+1)/3.  IIRCOEF[r] here is table row INDEX r.
IIRCOEF = {
    1: np.array([0.5984134206, 0.1038383077, -0.0121238572, 0.0013108988,
                 -0.0001376963, 0.0000144192, -0.0000023625, -0.0000000267,
                 0.1511297752, -0.0176956557, 0.0019154795, -0.0002012217,
                 0.0000206591, -0.0000006002, 0.0000000180], np.float32),
    2: np.array([0.3989422804, 0.1414542400, -0.0030406818, -0.0041116157,
                 0.0006696623, 0.0000498707, -0.0000449761, -0.0000051528,
                 0.2519574622, -0.0098627835, -0.0067013653, 0.0012572396,
                 0.0000481394, -0.0000097781, 0.0000006462], np.float32),
}


def _iir_half_scan(rows, r, coef, reverse):
    """One directional pass over (n_rows, n) float32 rows: pass0a/0b
    (oclimgutil.cl:542-578).  Returns the tmp buffer (warmup writes at
    repeat1 positions included, exactly as the device leaves them)."""
    n_rows, n = rows.shape
    tmp = np.zeros_like(rows)
    iv = np.zeros((8, n_rows), np.float32)
    tv = np.zeros((7, n_rows), np.float32)
    xs = (range(-(r + 1 + 8), n) if not reverse
          else range(n + (r + 1 + 8), -1, -1))
    for x in xs:
        iv[1:] = iv[:-1]
        iv[0] = rows[:, mirror1(x, n)]
        # association matches the kernel: d = c0*iv0; d += (ff sum);
        # d += (fb sum) — each sum left-associated float32
        d = (coef[0] * iv[0]).astype(np.float32)
        s = (coef[1] * iv[1]).astype(np.float32)
        for k in range(2, 8):
            s += coef[k] * iv[k]
        d += s
        s = (coef[8] * tv[0]).astype(np.float32)
        for j in range(1, 7):
            s += coef[8 + j] * tv[j]
        d += s
        tmp[:, x % n] = d
        tv[1:] = tv[:-1]
        tv[0] = d
    return tmp


def iirblur(img, r=2):
    """Full iirblur_f_f chain (host order oclimgutil.c:243-273):
    horizontal fwd+bwd combine, then vertical fwd+bwd combine."""
    img = np.asarray(img, np.float32)
    coef = IIRCOEF[r]
    t0 = _iir_half_scan(img, r, coef, reverse=False)
    t1 = _iir_half_scan(img, r, coef, reverse=True)
    o = (t0 + t1 - img * coef[0]).astype(np.float32)
    t0 = _iir_half_scan(np.ascontiguousarray(o.T), r, coef, reverse=False)
    t1 = _iir_half_scan(np.ascontiguousarray(o.T), r, coef, reverse=True)
    return (t0.T + t1.T - o * coef[0]).astype(np.float32)
