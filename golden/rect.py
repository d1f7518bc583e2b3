"""Golden end-to-end rect pipeline — the reference executable proxy.

The container has no OpenCL vendor ICD, so `/root/reference` cannot run;
this module composes the loop-level golden transcriptions of every
reference kernel into one `rect_frame` that mirrors the full per-frame
DAG (genGPUTask, oclrect.c:235-381) and the CPU hypothesis/pose stage
(executeCPUTask, oclrect.c:1049-1226).  It is the "engine A" of the
A/B parity harness (tools/ab_parity.py); the TPU build is engine B.

Documented stand-ins for the reference's nondeterminism (geometry-
preserving, ids differ):
  * CCL is the exact min-flat-index fixpoint instead of 10 approximate
    passes (the reference converges on real content);
  * the reduceLS hash table is claimed in raster scan order instead of
    atomic arrival order (collisions resolve deterministically);
  * mkpl's argmax tie-break is min flat index instead of 13 random bits.
"""

from __future__ import annotations

import numpy as np

from golden import imgutil as gi
from golden import labeling as gl
from golden import polyline as gp
from golden import regions as gr
from golden import geometry as gg


# --- reduceLS (oclrect.cl:427-464) -------------------------------------------

def reduce_ls_table(boundary, lsid_map, nentry):
    """(nentry, 5) int64 table: {owner lsid, max(iw-x), max(x),
    max(ih-y), max(y)} per claimed (lsid, bid) hash slot.  Claims are
    first-writer-wins in raster scan order (deterministic stand-in for
    atomic_cmpxchg arrival order)."""
    ih, iw = boundary.shape
    table = np.zeros((nentry, 5), np.int64)
    ys, xs = np.nonzero(lsid_map > 0)
    for y, x in zip(ys.tolist(), xs.tolist()):
        if x <= 0 or y <= 0 or x >= iw - 1 or y >= ih - 1:
            continue
        lsid = int(lsid_map[y, x])
        win = boundary[max(0, y - 3):y + 4, max(0, x - 3):x + 4]
        for bid in np.unique(win):
            if bid <= 0:
                continue
            h = ((int(lsid) * int(bid)) & 0x7FFFFFFF) % nentry
            if table[h, 0] == 0:
                table[h, 0] = lsid
            if table[h, 0] != lsid:
                continue
            table[h, 1] = max(table[h, 1], iw - x)
            table[h, 2] = max(table[h, 2], x)
            table[h, 3] = max(table[h, 3], ih - y)
            table[h, 4] = max(table[h, 4], y)
    return table


# --- executeCPUTask (oclrect.c:1049-1226) ------------------------------------

def _finish_group(als, iw, ih, tan_aov, status_base):
    red = gg.reduce_group(als)
    if red is None:
        return None
    corners = np.array([seg[0] for seg in red], np.float64)
    c2, c3, val = gg.pose_estimation(corners, iw, ih, tan_aov)
    status = status_base
    if gg.looks_like_a_screen(c2, c3, val):
        status |= 1
    return {"c2": np.asarray(c2, np.float64), "c3": np.asarray(c3),
            "value": float(val), "status": status}


def execute_cpu_task(segs, count, lsid_map, boundary, table, iw, ih,
                     tan_aov):
    """Hypothesis sources A (region boundaries, oclrect.c:1064-1171) and
    B (whole polylines, :1175-1217) -> accepted rect list."""
    nentry = table.shape[0]
    rects = []

    # source A: probe 3 points x perpendicular offsets -2..2 around every
    # segment; collect segid -> {lsid} sets (oclrect.c:1070-1096)
    ls_map: dict[int, list[int]] = {}
    for i in range(1, count + 1):
        s = segs[i]
        if s.polyid == 0:
            continue
        x0, y0 = np.rint(s.sx), np.rint(s.sy)
        x1, y1 = np.rint(s.ex), np.rint(s.ey)
        dx, dy = x1 - x0, y1 - y0
        nrm = np.hypot(dx, dy)
        if nrm == 0:
            vdx = vdy = 0.0
        else:
            vdx, vdy = -dy / nrm, dx / nrm
        for j in range(3):
            for dist in range(-2, 3):
                px = x0 + dx * ((j + 0.5) / 3) + vdx * dist
                py = y0 + dy * ((j + 0.5) / 3) + vdy * dist
                x, y = int(px + 0.5), int(py + 0.5)
                if x < 0 or x >= iw or y < 0 or y >= ih:
                    continue
                segid = int(boundary[y, x])
                if segid <= 0:
                    continue
                lst = ls_map.setdefault(segid, [])
                if i not in lst:
                    lst.append(i)

    for segid, lsids in ls_map.items():
        if len(lsids) < 4:
            continue
        als = []
        for lsid in lsids:
            h = ((lsid * segid) & 0x7FFFFFFF) % nentry
            s = segs[lsid]
            if table[h, 0] != lsid:
                if table[h, 0] != 0:
                    # collision: foreign owner -> use the UNCLIPPED
                    # segment (oclrect.c:1117-1121)
                    als.append(((s.sx, s.sy), (s.ex, s.ey)))
                continue
            cl = gg.clip_line(s.sx, s.sy, s.ex, s.ey,
                              iw - table[h, 1], ih - table[h, 3],
                              table[h, 2], table[h, 4])
            if cl is None or np.isnan(cl[0]):
                continue
            als.append(((cl[0], cl[1]), (cl[2], cl[3])))
        r = _finish_group(als, iw, ih, tan_aov, 0)
        if r is not None:
            rects.append(r)

    # source B: walk rightPtr chains from heads, keep segments > 32 px
    for i in range(1, count + 1):
        if segs[i].polyid == 0 or segs[i].left > 0:
            continue
        als = []
        j = i
        while j > 0:
            s = segs[j]
            if (s.sx - s.ex) ** 2 + (s.sy - s.ey) ** 2 > 32.0 ** 2:
                als.append(((s.sx, s.sy), (s.ex, s.ey)))
            j = s.right
        r = _finish_group(als, iw, ih, tan_aov, 2)
        if r is not None:
            rects.append(r)
    return rects


# --- the full frame (genGPUTask order, oclrect.c:235-381) ---------------------

def rect_frame(bgr, tan_aov):
    """BGR (H,W,3) uint8 -> list of accepted rect dicts
    {c2 (4,2), c3 (4,3), value, status}."""
    bgr = np.asarray(bgr, np.uint8)
    ih, iw = bgr.shape[:2]

    # color + blur + repack (oclrect.c:245-251)
    packed0 = gi.srgb2plab_exact(bgr).astype(np.int64) & 0xFFFFFFFF
    ch = [((packed0 & 4095) + 0.5) / 4096.0,
          (((packed0 >> 12) & 1023) + 0.5) / 1024.0,
          (((packed0 >> 22) & 1023) + 0.5) / 1024.0]
    bl = [gi.iirblur(c.astype(np.float32), 2) for c in ch]
    # packlab: convert_uint_rtn = floor (oclimgutil.cl:28-34)
    q0 = np.clip(np.floor(bl[0] * 4096), 0, 4095).astype(np.int64)
    q1 = np.clip(np.floor(bl[1] * 1024), 0, 1023).astype(np.int64)
    q2 = np.clip(np.floor(bl[2] * 1024), 0, 1023).astype(np.int64)
    packed_blur = (q2 << 22) | (q1 << 12) | q0

    # gradient direction on the blurred L plane (oclrect.c:253)
    vec = gi.edgevec(bl[0])
    # edge magnitude on the packed blurred Lab (oclrect.c:257): unpacked
    # values ARE lattice centers, no further quantization
    labf_blur = np.stack([((packed_blur & 4095) + 0.5) / 4096.0,
                          (((packed_blur >> 12) & 1023) + 0.5) / 1024.0,
                          (((packed_blur >> 22) & 1023) + 0.5) / 1024.0],
                         axis=-1)
    em = gi.edge_lab(labf_blur)
    thin = gi.thinthres(em, vec)
    edge_bin = (thin > 0).astype(np.int64)       # oclrect.c:262-263

    # morphology (rect variant, oclrect.c:265-272)
    jn = gl.simple_junction(edge_bin)
    conn = gl.simple_connect_rect(jn)
    s = gl.stringify(conn, 0)
    s = gl.stringify(s, 1)

    # weak labeling + strength filters (oclrect.c:274-312)
    lbl = gl.label_components(s, 0)
    st = gl.calc_strength(thin, lbl)
    weak = gl.filter_strength(lbl, st, 500)
    weak_bin = (weak > 0).astype(np.int64)

    # edge-limited blur x10 + quantize + despeckle (oclrect.c:286-303)
    pk = packed0.copy()
    for _ in range(10):
        pk = gr.blblur0(pk, weak_bin)
        pk = gr.blblur1(pk, weak_bin)
    pk = gr.quantize(pk, 24)
    pk = gr.despeckle(pk, thin)

    strong = gl.filter_strength(weak, st, 2500)
    strong_bin = (strong > 0).astype(np.int64)

    # merge masks + region merge CCL + despeckle2 (oclrect.c:314-336)
    jn2 = gl.simple_junction(strong, positive_only=True)
    mask = gr.merge_mask(jn2)
    seg = gr.label_merge(pk, mask, strong)
    sizes = gr.label_sizes(seg)
    seg = gr.despeckle2(seg, sizes, 16)

    # boundary labeling (oclrect.c:340-342)
    bmark = gr.mark_boundary(seg)
    boundary = gl.label_components(bmark, -1)

    # polylines on strong edges (oclrect.c:361)
    cap = max(256, iw * ih * 16 // 56)
    pls, lsid_map, count = gp.polyline_execute(strong_bin, 4.0, 20, cap)

    # reduceLS + CPU hypothesis/pose stage (oclrect.c:365-367, 1049-1226)
    nentry = iw * ih * 4 // 5
    table = reduce_ls_table(boundary, lsid_map, nentry)
    return execute_cpu_task(pls, count, lsid_map, boundary, table,
                            iw, ih, tan_aov)
