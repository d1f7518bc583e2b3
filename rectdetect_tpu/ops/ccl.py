"""Connected-component labeling and per-component reductions.

The reference labels 8-connected equal-value components by iterative
min-label propagation: init label=flat index (labelxPreprocess,
oclimgutil.cl:495-509), then MAXPASS=10 passes of {min over 8-neighborhood,
6 pointer-jumping steps g=label[g], atomic_min to label[og] and label[p0]}
(label8xMain, oclimgutil.cl:511-538).

TPU re-design (no atomics, fully deterministic):
  * neighbor min      -> 8 statically shifted min-selects
  * pointer jumping   -> flat gathers label[label]
  * atomic_min        -> scatter-min (`.at[idx].min(val)`), order-independent
Background uses sentinel N (the flat size) so gathers/scatters fall into a
dump slot; converted to -1 on output like the reference.

The same skeleton serves labelpl (arc splitting) and labelMerge (region
merging) — they pass different neighbor predicates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rectdetect_tpu.ops.shifts import NEIGH8, pad2d, shifted


def _flat_neighbor_idx(h, w, dy, dx):
    """Flat index of the (dy,dx) neighbor, or -1 out of bounds."""
    y = jnp.arange(h)[:, None] + dy
    x = jnp.arange(w)[None, :] + dx
    ok = (y >= 0) & (y < h) & (x >= 0) & (x < w)
    return jnp.where(ok, y * w + x, -1), ok


def _pointer_jump(label_ext, g, n_jumps):
    for _ in range(n_jumps):
        g = label_ext[g]
    return g


def _scan_flood(label_flat, pix, bgc, sent, h, w):
    """Row+column segmented-min flood over equal-value runs (gather-free).

    Straight runs of a component converge in one shot, so pointer jumping
    only has to cover the turns — with this boost 2-3 jumps per pass
    converge where the plain formulation needs 6-8."""
    from rectdetect_tpu.ops.regions import _segmented_min_1d
    lbl = label_flat.reshape(h, w)
    fgm = pix != bgc
    link_h = (pix[:, 1:] == pix[:, :-1]) & fgm[:, 1:] & fgm[:, :-1]
    link_v = (pix[1:, :] == pix[:-1, :]) & fgm[1:, :] & fgm[:-1, :]
    lbl = _segmented_min_1d(lbl, link_h)
    lbl = _segmented_min_1d(lbl.T, link_v.T).T
    return lbl.reshape(-1)


def label_components(pix, bgc: int, n_passes: int, n_jumps: int,
                     compress: bool = True, sparse_cap: int | None = None,
                     scan_boost: bool = False, comp=None,
                     force_xla: bool = False, bh: int | None = None):
    """8-connected CCL over equal pixel values; background bgc -> label -1.

    pix: (H, W) int32.  Returns (H, W) int32 labels = min flat index of the
    component (the reference's converged fixpoint).

    The 8-neighbor candidate minimum is dense VPU work (statically shifted
    selects); the expensive part — pointer-jump gathers and the
    atomic-min-equivalent scatter — runs over a compacted foreground slot
    list when `sparse_cap` is given (ops/compact.py): identical labels,
    cost proportional to the number of foreground pixels instead of the
    frame.  Pipelines pass sparse_cap for the (sparse) edge/boundary CCL
    instances.

    On TPU this dispatches to the Pallas two-level exact CCL
    (ops/pallas_ccl.py): ~2.4x faster at 720p AND exact (the fixed pass
    budget here leaves ~0.6% of pixels unconverged on dense noise), so
    the pass/jump/capacity knobs only shape the CPU/testing path.
    """
    if jax.default_backend() == "tpu" and not force_xla:
        from rectdetect_tpu.ops.pallas_ccl import label_components_exact
        return label_components_exact(pix, bgc, bh=bh, comp=comp)
    h, w = pix.shape
    n = h * w
    sent = n
    flat_pix = pix.reshape(-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    fg = flat_pix != bgc

    # labelxPreprocess: seed from the up/left equal neighbor when possible.
    pixp = pad2d(pix, 1, "zero", constant=bgc ^ 0x55555555)
    up_same = shifted(pixp, 1, -1, 0, h, w) == pix
    left_same = shifted(pixp, 1, 0, -1, h, w) == pix
    idx2d = idx.reshape(h, w)
    seed = jnp.where(up_same, idx2d - w, jnp.where(left_same, idx2d - 1, idx2d))
    label = jnp.where(fg, seed.reshape(-1), sent).astype(jnp.int32)

    pixq = pad2d(pix, 1, "zero", constant=bgc ^ 0x55555555)

    def neighbor_min(label):
        lblp = pad2d(label.reshape(h, w), 1, "zero", constant=sent)
        g = label.reshape(h, w)
        for (dy, dx) in NEIGH8:
            cand = shifted(lblp, 1, dy, dx, h, w)
            same = shifted(pixq, 1, dy, dx, h, w) == pix
            g = jnp.minimum(g, jnp.where(same, cand, sent))
        return g.reshape(-1)

    if sparse_cap is None:
        def one_pass(label):
            g = neighbor_min(label)
            label_ext = jnp.concatenate([label,
                                         jnp.asarray([sent], jnp.int32)])
            g = _pointer_jump(label_ext, g, n_jumps)
            og = jnp.where(fg, label, sent)
            g = jnp.where(fg, g, sent)
            new = label.at[og].min(jnp.where(og < sent, g, sent),
                                   mode="drop")
            return jnp.minimum(new, g)

        for _ in range(n_passes):
            label = one_pass(label)

        if compress:
            ext = jnp.concatenate([label, jnp.asarray([sent], jnp.int32)])
            for _ in range(4):
                ext = ext[jnp.minimum(ext, sent)]
            label = ext[:-1]
        out = jnp.where(fg, label, -1)
        return out.reshape(h, w).astype(jnp.int32)

    # ---- sparse jump/scatter path ---------------------------------------
    from rectdetect_tpu.ops.compact import compact_mask
    comp = compact_mask(fg, sparse_cap)
    slots = jnp.clip(comp.idx, 0, n - 1)
    live = comp.valid()
    # one extra slot at index n holds the sentinel
    label = jnp.concatenate([label, jnp.asarray([sent], jnp.int32)])

    def one_pass(label):
        body = label[:n]
        if scan_boost:
            body = _scan_flood(body, pix, bgc, sent, h, w)
        g_dense = neighbor_min(body)
        g_s = jnp.where(live, g_dense[slots], sent)
        for _ in range(n_jumps):
            g_s = label[jnp.minimum(g_s, sent)]
        og_s = jnp.where(live, label[slots], sent)
        new = label.at[:n].set(jnp.minimum(label[:n], body))
        new = new.at[og_s].min(g_s, mode="drop")
        new = new.at[jnp.where(live, slots, sent)].min(g_s, mode="drop")
        return new.at[sent].set(sent)

    for _ in range(n_passes):
        label = one_pass(label)

    if compress:
        l_s = jnp.where(live, label[slots], sent)
        for _ in range(4):
            l_s = label[jnp.minimum(l_s, sent)]
        label = label.at[jnp.where(live, slots, sent)].set(l_s, mode="drop")

    out = jnp.where(fg, label[:n], -1)
    return out.reshape(h, w).astype(jnp.int32)


def calc_strength(edge_img, label, scale: float = 10000.0, comp=None):
    """Per-component sum of (int)(edge^2 * scale) over interior pixels.

    Mirrors calcStrength (oclimgutil.cl:641-649): skips the 1px border and
    labels <= 0; per-pixel int truncation before summing.

    comp: optional Compaction covering all label > 0 pixels — the
    scatter-add then runs over slots instead of the full frame."""
    h, w = edge_img.shape
    n = h * w
    if comp is not None:
        live = comp.valid()
        p = jnp.clip(comp.idx, 0, n - 1)
        yy = p // w
        xx = p % w
        inter = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
        lbl = label.reshape(-1)[p]
        val = jnp.trunc(edge_img.reshape(-1)[p] ** 2 * scale
                        ).astype(jnp.int32)
        ok = live & inter & (lbl > 0)
        tgt = jnp.where(ok, lbl, n)
        return jnp.zeros((n + 1,), jnp.int32).at[tgt].add(
            jnp.where(ok, val, 0), mode="drop")[:n]
    inter = _interior_mask(h, w, 1)
    lbl = label.reshape(-1)
    val = jnp.trunc(edge_img.reshape(-1) ** 2 * scale).astype(jnp.int32)
    ok = inter.reshape(-1) & (lbl > 0)
    tgt = jnp.where(ok, lbl, n)
    acc = jnp.zeros((n + 1,), jnp.int32).at[tgt].add(jnp.where(ok, val, 0),
                                                     mode="drop")
    return acc[:n]


def filter_strength(label, strength, thre: int, comp=None):
    """Kill weak components (filterStrength, oclimgutil.cl:651-657).

    Interior pixels whose component strength < thre (or label <= 0) -> -1.
    Border pixels keep their label, as in the reference.

    comp: optional Compaction covering all label > 0 pixels — the
    per-pixel strength gather then runs over slots; pixels outside the
    compaction have label <= 0, which the dense path kills to -1 at the
    interior anyway, so the base image is where(interior, -1, label)."""
    h, w = label.shape
    n = h * w
    if comp is not None:
        live = comp.valid()
        p = jnp.clip(comp.idx, 0, n - 1)
        lbl_s = jnp.where(live, label.reshape(-1)[p], 0)
        st_s = strength[jnp.clip(lbl_s, 0, strength.shape[0] - 1)]
        keep = live & (lbl_s > 0) & (st_s >= thre)
        inter = _interior_mask(h, w, 1)
        base = jnp.where(inter, -1, label).reshape(-1)
        out = jnp.concatenate([base, jnp.zeros((1,), base.dtype)]).at[
            jnp.where(keep, p, n)].set(lbl_s, mode="drop")[:n]
        return out.reshape(h, w)
    inter = _interior_mask(h, w, 1)
    lbl = label.reshape(-1)
    st = strength[jnp.clip(lbl, 0, strength.shape[0] - 1)]
    kill = (lbl <= 0) | (st < thre)
    out = jnp.where(inter.reshape(-1) & kill, -1, lbl)
    return out.reshape(h, w)


def strength_filter_pair(edge_img, label, comp, thre_weak: int,
                         thre_strong: int, scale: float = 10000.0):
    """Fused calcStrength + BOTH filterStrength applications
    (oclimgutil.cl:641-657; thresholds oclrect.c:277/307).

    Output-identical to
        st = calc_strength(edge, label, scale, comp)
        weak = filter_strength(label, st, thre_weak, comp)
        strong = filter_strength(weak, st, thre_strong, comp)
    but shares ONE slot gather of (label, strength value) and one gather
    of the component strengths across the three ops — random-row gathers
    dominate these table ops (docs/SOL.md), and the unfused form pays
    six of them at the strings slot count.

    (`strong` from `weak` equals `strong` from `label`: both filters
    only kill interior pixels by the same per-component predicate, and
    thre_strong >= thre_weak means the strong kill set contains the weak
    one.)

    The per-component sums run SORT-SEGMENTED instead of scatter-add +
    random gather: slots kv-sort by label (measured cheaper than one
    random gather at these row counts, tools/prim_bench.py), the
    component total falls out of run-boundary cumsum differences —
    i32 adds are order-independent, so the result is bit-identical —
    and each slot reads its total in place with zero random access.
    The (n+1,) strength table in the return value is materialized by a
    separate scatter-add that XLA dead-code-eliminates when the caller
    ignores it (the fused pipeline path does).
    """
    h, w = edge_img.shape
    n = h * w
    val_full = jnp.trunc(edge_img.reshape(-1) ** 2 * scale
                         ).astype(jnp.int32)
    packed = jnp.stack([label.reshape(-1), val_full], axis=1)
    live = comp.valid()
    p = jnp.clip(comp.idx, 0, n - 1)
    rows = packed[p]                               # one (S,2) row gather
    lbl_s = rows[:, 0]
    val_s = rows[:, 1]
    yy = p // w
    xx = p % w
    inter = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    ok = live & inter & (lbl_s > 0)
    live2 = live & (lbl_s > 0)

    # sort by label; border slots participate (they read their
    # component's total) but contribute 0 (the reference sums interior
    # pixels only, oclimgutil.cl:641-649).  The label itself is not a
    # sort payload: key == label for every live slot, and only live
    # slots scatter.
    key = jnp.where(live2, lbl_s, n)
    contrib = jnp.where(ok, val_s, 0)
    skey, sval, sp = jax.lax.sort((key, contrib, p), num_keys=1)
    slbl = skey
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    last = jnp.concatenate([skey[1:] != skey[:-1], jnp.ones((1,), bool)])
    S = skey.shape[0]
    thre_max = int(max(thre_weak, thre_strong))
    if S * thre_max < 2**31:
        # The sorted-path totals feed ONLY the two threshold compares
        # below, so clamping each contribution at max(thre) preserves
        # every decision exactly (if any element >= thre the clamped run
        # sum is >= thre; otherwise sums are equal until they exceed
        # thre) while statically bounding the global cumsum at
        # S * thre_max < 2^31 — the frame-total int32 wraparound an
        # adversarial dense frame could otherwise hit (total strength
        # measured 6.9e8 at 720p, ~9x at 4K).
        csum = jnp.cumsum(jnp.minimum(sval, thre_max))
        pre = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])
        # base_i = csum just before this run's first element; csum is
        # nondecreasing (clamped contrib >= 0, no wrap by the bound
        # above), so a running max of `pre` frozen at run firsts
        # forward-fills it
        base_c = jax.lax.cummax(jnp.where(first, pre, 0))
        # end_i = csum at this run's last element: reverse running min
        # of csum frozen at run lasts
        big = jnp.iinfo(jnp.int32).max
        end_c = jax.lax.cummin(jnp.where(last, csum, big), reverse=True)
    else:
        # Very large slot lists (dense 4K plans): even clamped cumsums
        # can wrap, so forward-fill run-boundary INDICES (monotone by
        # construction) and gather the prefix sums at those indices.
        # end - base is then exact mod 2^32, hence exact whenever each
        # per-component sum fits int32 — the reference's own assumption
        # for its int accumulator (oclimgutil.cl:648).  Costs two S-row
        # gathers; only ever traced for S >= ~859k slot lists.
        csum = jnp.cumsum(sval)
        pre = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])
        sidx = jnp.arange(S, dtype=jnp.int32)
        base_idx = jax.lax.cummax(jnp.where(first, sidx, 0))
        end_idx = jax.lax.cummin(jnp.where(last, sidx, S - 1),
                                 reverse=True)
        base_c = pre[base_idx]
        end_c = csum[end_idx]
    st_sorted = end_c - base_c                     # component total/slot

    inter_full = _interior_mask(h, w, 1)
    base = jnp.where(inter_full, -1, label).reshape(-1)
    base = jnp.concatenate([base, jnp.zeros((1,), base.dtype)])
    s_live = skey < n

    # ONE slot scatter for both filter outputs: strong survivors tag
    # bit 29 (labels are flat indices < n << 2^29) and the two maps
    # split elementwise — strong_keep is a subset of weak_keep since
    # thre_strong >= thre_weak.
    flag = jnp.int32(1 << 29)
    assert n < (1 << 29)
    keep_w = s_live & (st_sorted >= thre_weak)
    tagged = jnp.where(st_sorted >= thre_strong, slbl + flag, slbl)
    out = base.at[jnp.where(keep_w, sp, n)].set(tagged, mode="drop")[:n]
    weak_img = jnp.where(out >= flag, out - flag, out).reshape(h, w)
    strong_img = jnp.where(out >= flag, out - flag,
                           base[:n]).reshape(h, w)

    # (n+1,) table for callers that consume it (dead code under the
    # fused pipeline jit)
    tgt = jnp.where(ok, lbl_s, n)
    st = jnp.zeros((n + 1,), jnp.int32).at[tgt].add(
        jnp.where(ok, val_s, 0), mode="drop")[:n]

    return weak_img, strong_img, st


def rescue_filtered(pre_label, filtered, rounds: int = 3):
    """Fail-open repair of strength filtering under piece labels.

    The capped/fixed-pass CCL can return a real component as several
    label pieces; filter_strength then thresholds each piece's PARTIAL
    strength, so a tiny sliver of a strong edge (a staircase-corner
    piece of a shallow-slope side, where the NMS response dips) can die
    even though its component total is far above the threshold —
    fragmenting the edge and losing whole quad sides downstream.

    Repair: a killed foreground pixel that is 8-adjacent to a SURVIVING
    pixel is 8-connected to it, i.e. the same component under exact CCL
    (oclimgutil.cl:495-538), whose total is >= the surviving piece's
    partial >= the threshold — so exact filtering keeps it.  Each round
    is one dilate-and-restore (pure VPU shifts); `rounds` bounds rescue
    chains of adjacent under-threshold slivers.  Sound (never keeps what
    exact filtering would kill) but not complete: components ALL of
    whose pieces are individually under threshold stay dead — the deep
    low-contrast regime where detection is marginal anyway.

    pre_label: the label image BEFORE filtering (>0 = foreground);
    filtered: filter_strength's output.  Returns the repaired image.
    """
    h, w = pre_label.shape
    fg = pre_label > 0
    out = filtered
    for _ in range(rounds):
        surv = out > 0
        sp_ = pad2d(surv, 1, "zero", constant=False)
        near = jnp.zeros((h, w), bool)
        for dy, dx in NEIGH8:
            near = near | shifted(sp_, 1, dy, dx, h, w)
        out = jnp.where(fg & ~surv & near, pre_label, out)
    return out.astype(jnp.int32)


def component_sizes(label, num: int | None = None, ignore: int = 0,
                    comp=None):
    """Histogram of label occurrences (calcSize, oclpolyline.cl:357-365).

    comp: optional Compaction covering all non-`ignore` pixels — the
    scatter then runs over slots instead of the full frame."""
    h, w = label.shape
    n = num if num is not None else h * w
    if comp is not None:
        live = comp.valid()
        lbl = jnp.where(live, label.reshape(-1)[jnp.clip(comp.idx, 0,
                                                         h * w - 1)],
                        ignore)
    else:
        lbl = label.reshape(-1)
    ok = lbl != ignore
    tgt = jnp.where(ok & (lbl >= 0) & (lbl < n), lbl, n)
    return jnp.zeros((n + 1,), jnp.int32).at[tgt].add(
        jnp.where(tgt < n, 1, 0), mode="drop")[:n]


@functools.lru_cache(maxsize=None)
def _interior_cache(h, w, margin):
    import numpy as np
    m = np.zeros((h, w), bool)
    m[margin:h - margin, margin:w - margin] = True
    return m


def _interior_mask(h, w, margin):
    return jnp.asarray(_interior_cache(h, w, margin))


def interior_mask(h, w, margin, x0=0, w_total=None):
    """Frame-interior mask for a width slice of a (h, w_total) frame whose
    local column 0 sits at global x `x0` (rows are always full height).

    With the defaults this is the cached single-chip mask; the offset form
    serves the width-tiled distribution layer (dist/tile.py), where ops run
    on halo-widened tiles and "border" means the TRUE frame border.  x0 may
    be a traced scalar (lax.axis_index arithmetic)."""
    if w_total is None and isinstance(x0, int) and x0 == 0:
        return _interior_mask(h, w, margin)
    wt = w if w_total is None else w_total
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xg = jnp.arange(w, dtype=jnp.int32)[None, :] + x0
    return ((yy >= margin) & (yy < h - margin) &
            (xg >= margin) & (xg < wt - margin))


def _scan_flood_arcs(label_flat, number, sent, h, w):
    """Row+column segmented-min flood with the labelpl adjacency
    (|number difference| <= 1, both foreground)."""
    from rectdetect_tpu.ops.regions import _segmented_min_1d
    lbl = label_flat.reshape(h, w)
    fgm = number > 0
    link_h = (jnp.abs(number[:, 1:] - number[:, :-1]) <= 1) & \
        fgm[:, 1:] & fgm[:, :-1]
    link_v = (jnp.abs(number[1:, :] - number[:-1, :]) <= 1) & \
        fgm[1:, :] & fgm[:-1, :]
    lbl = _segmented_min_1d(lbl, link_h)
    lbl = _segmented_min_1d(lbl.T, link_v.T).T
    return lbl.reshape(-1)


def label_arcs(number, n_passes: int = 12, n_jumps: int = 8,
               sparse_cap: int | None = None, scan_boost: bool = False,
               comp=None):
    """Group string pixels into arcs of consecutive arc-length numbers.

    Mirrors labelpl_preprocess/labelpl_main (oclpolyline.cl:312-355, host
    N=12 at oclpolyline.c:170-184): pixels with number==0 (chain heads and
    background) become background; 8-neighbors are merged when their
    numbers differ by <= 1.  Background label is 0 (the labelpl
    convention), foreground labels are min flat indices (> 0 since border
    pixels are background).  sparse_cap: see label_components.

    On TPU this dispatches to the Pallas exact arc labeler
    (ops/pallas_ccl.py), same rationale as label_components.
    """
    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_ccl import label_arcs_exact
        return label_arcs_exact(number, comp=comp)
    h, w = number.shape
    n = h * w
    sent = n
    fg2d = number > 0
    fg = fg2d.reshape(-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    label = jnp.where(fg, idx, sent)

    nump = pad2d(number, 1, "zero", constant=-9)

    def neighbor_min(label):
        lblp = pad2d(label.reshape(h, w), 1, "zero", constant=sent)
        g = label.reshape(h, w)
        for (dy, dx) in NEIGH8:
            cand = shifted(lblp, 1, dy, dx, h, w)
            nb = shifted(nump, 1, dy, dx, h, w)
            ok = (nb > 0) & (jnp.abs(nb - number) <= 1)
            g = jnp.minimum(g, jnp.where(ok, cand, sent))
        return g.reshape(-1)

    if sparse_cap is None:
        def one_pass(label):
            g = neighbor_min(label)
            label_ext = jnp.concatenate([label,
                                         jnp.asarray([sent], jnp.int32)])
            g = _pointer_jump(label_ext, g, n_jumps)
            og = jnp.where(fg, label, sent)
            g = jnp.where(fg, g, sent)
            new = label.at[og].min(g, mode="drop")
            return jnp.minimum(new, g)

        for _ in range(n_passes - 1):
            label = one_pass(label)
        ext = jnp.concatenate([label, jnp.asarray([sent], jnp.int32)])
        for _ in range(4):
            ext = ext[ext]
        label = ext[:-1]
        return jnp.where(fg, label, 0).reshape(h, w).astype(jnp.int32)

    from rectdetect_tpu.ops.compact import compact_mask
    comp = compact_mask(fg, sparse_cap)
    slots = jnp.clip(comp.idx, 0, n - 1)
    live = comp.valid()
    label = jnp.concatenate([label, jnp.asarray([sent], jnp.int32)])

    def one_pass(label):
        body = label[:n]
        if scan_boost:
            body = _scan_flood_arcs(body, number, sent, h, w)
        g_dense = neighbor_min(body)
        g_s = jnp.where(live, g_dense[slots], sent)
        for _ in range(n_jumps):
            g_s = label[jnp.minimum(g_s, sent)]
        og_s = jnp.where(live, label[slots], sent)
        new = label.at[:n].set(jnp.minimum(label[:n], body))
        new = new.at[og_s].min(g_s, mode="drop")
        new = new.at[jnp.where(live, slots, sent)].min(g_s, mode="drop")
        return new.at[sent].set(sent)

    for _ in range(n_passes - 1):
        label = one_pass(label)

    l_s = jnp.where(live, label[slots], sent)
    for _ in range(4):
        l_s = label[jnp.minimum(l_s, sent)]
    label = label.at[jnp.where(live, slots, sent)].set(l_s, mode="drop")
    return jnp.where(fg, label[:n], 0).reshape(h, w).astype(jnp.int32)


def filter_size(label, sizes, size_thre: int):
    """Zero labels whose component size is <= size_thre.

    filterSize (oclpolyline.cl:367-378); label 0 is background (its size
    histogram slot is never incremented, so it filters to 0 as well).
    """
    h, w = label.shape
    lbl = label.reshape(-1)
    sz = sizes[jnp.clip(lbl, 0, sizes.shape[0] - 1)]
    return jnp.where(sz > size_thre, lbl, 0).reshape(h, w).astype(jnp.int32)


def relabel_dense(label):
    """Compact labels to dense ids 1..count, deterministically.

    relabel_pass0/pass1 (oclpolyline.cl:380-420) assign dense ids via an
    atomic counter in GPU-scheduling order; here roots (label == own flat
    index) are ranked by flat index instead — deterministic, same set of
    components.  Borders are zeroed like relabel_pass1 (oclpolyline.cl:406).
    Returns (dense_label (H,W) int32 with 0 background, count int32).
    """
    h, w = label.shape
    n = h * w
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    interior = ((yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1))
    lbl = jnp.where(interior, label, 0).reshape(-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_root = (lbl == idx) & (lbl != 0)
    rank = jnp.cumsum(is_root.astype(jnp.int32))
    table = jnp.where(is_root, rank, 0).astype(jnp.int32)
    out = jnp.where(lbl != 0, table[jnp.clip(lbl, 0, n - 1)], 0)
    return out.reshape(h, w).astype(jnp.int32), rank[-1]


def filter_relabel_sparse(label, sizes, size_thre: int, comp):
    """relabel_dense(filter_size(label, sizes, size_thre)) computed in
    slot space: comp must cover all labeled pixels (labels are a subset
    of the compacted strings foreground in the polyline pipeline).

    Slot order is flat order, so ranking roots over slots reproduces the
    dense path's deterministic min-flat-index ids exactly; pixels beyond
    the compaction capacity degrade to background like every other
    slot-list overflow.  Returns (dense (H,W) int32, count)."""
    h, w = label.shape
    n = h * w
    live = comp.valid()
    p = jnp.clip(comp.idx, 0, n - 1)
    l_s = jnp.where(live, label.reshape(-1)[p], 0)
    sz = sizes[jnp.clip(l_s, 0, sizes.shape[0] - 1)]
    f_s = jnp.where(sz > size_thre, l_s, 0)
    yy = p // w
    xx = p % w
    interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)
    f_s = jnp.where(interior, f_s, 0)
    is_root = (f_s == p) & (f_s != 0)
    rank = jnp.cumsum(is_root.astype(jnp.int32))
    table = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(is_root, p, n)].set(rank, mode="drop")
    dense_s = jnp.where(f_s != 0, table[jnp.clip(f_s, 0, n - 1)], 0)
    out = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(live, p, n)].set(dense_s, mode="drop")[:n]
    return out.reshape(h, w).astype(jnp.int32), rank[-1] if rank.size else 0


def label_components_adaptive(pix, bgc: int, n_passes: int, n_jumps: int,
                              small_cap: int, big_cap: int,
                              scan_boost: bool = True,
                              round_cap: int = 0,
                              pieces_ok: bool = False,
                              force_xla: bool = False,
                              bh: int | None = None):
    """label_components with a runtime capacity switch.

    Both branches compute the exact same labels; the foreground count
    picks the cheap small-slot-list branch when it fits (gather/scatter
    cost scales with the slot capacity, not the actual foreground).  The
    boundary map, for instance, is ~1-5% dense on typical frames but can
    approach 30% adversarially — the static worst-case cap would pay the
    adversarial price on every frame.

    On TPU this dispatches to the Pallas block CCL (ops/pallas_ccl.py),
    whose cost is density-independent, so no capacity switch is needed.
    round_cap > 0 bounds its in-VMEM flood rounds (percolated-noise
    components may come back as label pieces — the reference's own
    MAXPASS=10 trade, see pallas_ccl.label_blocked); pieces_ok
    additionally skips the cross-block seam resolution for consumers
    that only aggregate per label (strength filtering)."""
    import jax

    if jax.default_backend() == "tpu" and not force_xla:
        from rectdetect_tpu.ops.pallas_ccl import (label_components_exact,
                                                   label_components_pieces)
        if pieces_ok and round_cap:
            return label_components_pieces(pix, bgc, round_cap, bh=bh)
        return label_components_exact(pix, bgc, bh=bh,
                                      round_cap=round_cap or None)

    fg_count = jnp.sum((pix != bgc).astype(jnp.int32))

    def small(p):
        return label_components(p, bgc, n_passes, n_jumps,
                                sparse_cap=small_cap, scan_boost=scan_boost,
                                force_xla=force_xla)

    def big(p):
        return label_components(p, bgc, n_passes, n_jumps,
                                sparse_cap=big_cap, scan_boost=scan_boost,
                                force_xla=force_xla)

    return jax.lax.cond(fg_count <= small_cap, small, big, pix)


def label_components_converged(pix, bgc: int):
    """Run CCL to the exact fixpoint (for tests / robustness checks).

    Internally sentinel-coded (background = N); decoded to -1 at the end.
    """
    h, w = pix.shape
    sent = h * w
    fg = pix.reshape(-1) != bgc
    init = jnp.where(fg, jnp.arange(sent, dtype=jnp.int32),
                     sent).reshape(h, w)

    def cond(state):
        prev, cur, it = state
        return (it < sent) & jnp.any(prev != cur)

    def body(state):
        _, cur, it = state
        return cur, _ccl_pass_free(cur, pix, bgc), it + 1

    second = _ccl_pass_free(init, pix, bgc)
    _, out, _ = jax.lax.while_loop(cond, body, (init, second, jnp.int32(0)))
    ext = jnp.concatenate([out.reshape(-1), jnp.asarray([sent], jnp.int32)])
    for _ in range(6):
        ext = ext[ext]
    return jnp.where(fg, ext[:-1], -1).reshape(h, w)


def _ccl_pass_free(label2d, pix, bgc):
    """One CCL pass over a sentinel-coded (background = N) label image."""
    h, w = pix.shape
    n = h * w
    sent = n
    label = label2d.reshape(-1)
    lblp = pad2d(label.reshape(h, w), 1, "zero", constant=sent)
    pixq = pad2d(pix, 1, "zero", constant=bgc ^ 0x55555555)
    g = label.reshape(h, w)
    for (dy, dx) in NEIGH8:
        cand = shifted(lblp, 1, dy, dx, h, w)
        same = shifted(pixq, 1, dy, dx, h, w) == pix
        g = jnp.minimum(g, jnp.where(same, cand, sent))
    g = g.reshape(-1)
    ext = jnp.concatenate([label, jnp.asarray([sent], jnp.int32)])
    g = _pointer_jump(ext, g, 6)
    fg = pix.reshape(-1) != bgc
    og = jnp.where(fg, label, sent)
    g = jnp.where(fg, g, sent)
    new = label.at[og].min(g, mode="drop")
    new = jnp.minimum(new, g)
    return new.reshape(h, w)
