"""Region segmentation stages of the rect pipeline (oclrect.cl).

Everything operates on the packed-Lab int32 plane (core/color.py) exactly
like the reference, so integer-domain results (blblur's truncated integer
averages, the quantize lattice) are bit-compatible.

TPU formulation notes:
  * blblur0/1 (oclrect.cl:155-205) are 9-tap directional scans with
    data-dependent early termination.  The break conditions only look at a
    static window, so the scan unrolls into cumulative-AND include masks
    over statically shifted views — pure VPU, no gathers.
  * mkMergeMask0/1 (oclrect.cl:246-287) scatter rings/disks around junction
    pixels; scatter-by-structuring-element == dilation, computed as a conv
    with a 0/1 kernel (MXU work).
  * labelMergeMain (oclrect.cl:300-334) is the CCL skeleton with a
    4-neighbor color/mask/edge predicate; atomic_min -> scatter-min.
  * despeckle / despeckle2 pick the first-best candidate in the kernel's
    yy/xx scan order; the select cascade preserves exactly that order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rectdetect_tpu.core import color
from rectdetect_tpu.ops.shifts import pad2d, shifted

BLBLURSIZE = 4  # oclrect.cl:72


def _coord_maps(h, w):
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]
    return jnp.broadcast_to(yy, (h, w)), jnp.broadcast_to(xx, (h, w))


def _blblur_axis(packed, edge, horizontal: bool, x0=0,
                 w_total: int | None = None):
    """One blblur0 (horizontal) or blblur1 (vertical) pass
    (oclrect.cl:155-205).  packed: (H,W) int32 packed Lab; edge: (H,W)
    int32 0/1 (the int8 weak-edge map, oclrect.c:284).

    x0/w_total: global-x of local column 0 and the true frame width, for
    halo-widened width tiles (dist/tile.py) — the q<0 / q>limit-1 border
    breaks then fire at the TRUE frame border.  Beyond-frame halo columns
    never contribute (the break fires first), so any fill is safe."""
    h, w = packed.shape
    yy, xx = _coord_maps(h, w)
    if w_total is not None or not (isinstance(x0, int) and x0 == 0):
        xx = xx + x0
    cl, ca, cb = color.unpack_lab_int(packed)
    chans = (cl, ca, cb)

    ep = pad2d(edge, BLBLURSIZE + 1, "zero")
    cps = [pad2d(c, BLBLURSIZE + 1, "zero") for c in chans]
    r = BLBLURSIZE + 1

    def ed(dy, dx):
        return shifted(ep, r, dy, dx, h, w) != 0

    def ch(i, dy, dx):
        return shifted(cps[i], r, dy, dx, h, w)

    def off(k):  # offset along the scan axis
        return (0, k) if horizontal else (k, 0)

    # cross-axis +1 offset used by the diagonal-corner break test
    cross = (1, 0) if horizontal else (0, 1)
    wt = w if w_total is None else w_total
    coord = xx if horizontal else yy
    limit = wt if horizontal else h
    cross_coord = yy if horizontal else xx
    cross_limit = h if horizontal else wt

    oe = ed(0, 0)
    wsum = jnp.zeros((h, w), jnp.int32)
    csum = [jnp.zeros((h, w), jnp.int32) for _ in range(3)]

    # negative arm: k = 0, -1, ..., -BLBLURSIZE (oclrect.cl:162-169)
    alive = jnp.ones((h, w), bool)
    for k in range(0, -BLBLURSIZE - 1, -1):
        q = coord + k
        brk = q < 0
        brk |= (q > 0) & ed(*off(k)) & ~ed(*off(k - 1))
        brk |= ((q > 0) & (cross_coord < cross_limit - 1) & ~ed(*off(k)) &
                ed(*off(k - 1)) &
                ed(off(k)[0] + cross[0], off(k)[1] + cross[1]))
        alive = alive & ~brk
        wsum = wsum + alive
        for i in range(3):
            csum[i] = csum[i] + jnp.where(alive, ch(i, *off(k)), 0)

    # positive arm: k = 0..BLBLURSIZE (oclrect.cl:171-178)
    alive = jnp.ones((h, w), bool)
    for k in range(0, BLBLURSIZE + 1):
        q = coord + k
        brk = q > limit - 1
        brk |= (q < limit - 1) & ~ed(*off(k)) & ed(*off(k + 1))
        brk |= oe & ~ed(*off(k))
        alive = alive & ~brk
        wsum = wsum + alive
        for i in range(3):
            csum[i] = csum[i] + jnp.where(alive, ch(i, *off(k)), 0)

    ws = jnp.maximum(wsum, 1)
    avg = [c // ws for c in csum]  # int truncation like int3/int
    blurred = color.pack_lab_int(avg[0], avg[1], avg[2])
    return jnp.where(wsum == 0, packed, blurred)


def blblur(packed, edge, iters: int = 10, x0=0,
           w_total: int | None = None, block: int = 128,
           fuse: int = 0):
    """Edge-limited blur: `iters` rounds of horizontal+vertical passes
    (oclrect.c:286-296).

    On TPU this dispatches to the blocked Pallas kernel
    (ops/pallas_blblur.py): bit-exact and ~20x faster (17 ms vs 369 ms at
    720p) because Mosaic keeps each pass's shift chain in VMEM instead of
    materializing padded copies in HBM.  The x0/w_total offset form
    (halo-widened width tiles, dist/tile.py) also runs the Pallas path:
    the traced x0 enters the kernel as a coordinate-map input.

    fuse > 0 selects the fused multi-iteration kernel (one launch per
    `fuse` (H,V) iterations, halo'd row blocks — bit-exact, tuned via
    plan blblur_fuse); single-frame path only, since its halo layout
    needs static x origins."""
    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_blblur import (blblur_pallas_blocked,
                                                      blblur_pallas_fused)
        if fuse and isinstance(x0, int) and x0 == 0 and w_total is None:
            return blblur_pallas_fused(packed, edge, iters, fuse=fuse)
        return blblur_pallas_blocked(packed, edge, iters, block=block,
                                     x0=x0, w_total=w_total)

    def body(_, p):
        p = _blblur_axis(p, edge, True, x0, w_total)
        p = _blblur_axis(p, edge, False, x0, w_total)
        return p
    return jax.lax.fori_loop(0, iters, body, packed)


def quantize_packed(packed, n0: int = 24, n1: int = 24, n2: int = 24):
    """Quantize unpacked Lab floats to n levels and repack
    (quantize, oclrect.cl:207-216).  OpenCL round() is half-away-from-zero;
    values are non-negative so floor(x+0.5) matches."""
    v = color.unpack_labf(packed)
    n = jnp.asarray([n0, n1, n2], jnp.float32)
    q = jnp.floor(v * n + 0.5) / n
    return color.pack_lab(q)


def despeckle(packed, edge_mag):
    """On-edge pixels take the nearest-color off-edge 3x3 neighbor
    (despeckle, oclrect.cl:218-244).  edge_mag: (H,W) float (thinthres
    output, buf[1]); 'edge' means edge_mag >= 1e-6."""
    h, w = packed.shape
    yy, xx = _coord_maps(h, w)
    on_edge = edge_mag >= 1e-6
    lab = color.unpack_labf(packed)

    pp = pad2d(packed, 1, "zero")
    lp = pad2d(lab.transpose(2, 0, 1), 1, "zero")
    egp = pad2d(on_edge, 1, "zero", constant=True)

    best_d = jnp.full((h, w), 1e10, jnp.float32)
    best = packed
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            inb = ((yy + dy >= 0) & (yy + dy < h) &
                   (xx + dx >= 0) & (xx + dx < w))
            cand_edge = shifted(egp, 1, dy, dx, h, w)
            labn = shifted(lp, 1, dy, dx, h, w)
            d = jnp.sqrt(jnp.sum((labn.transpose(1, 2, 0) - lab) ** 2,
                                 axis=-1))
            ok = inb & ~cand_edge
            take = ok & (d < best_d)
            best_d = jnp.where(take, d, best_d)
            best = jnp.where(take, shifted(pp, 1, dy, dx, h, w), best)
    return jnp.where(on_edge, best, packed)


def quantize_despeckle(packed, edge_mag, n0: int = 24, n1: int = 24,
                       n2: int = 24, bh: int = 64):
    """quantize_packed + despeckle as one op (oclrect.c:300-303).

    On TPU this dispatches to the fused Pallas kernel
    (ops/pallas_morph.py), bit-exact vs the composition."""
    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_morph import quant_despeckle_pallas
        return quant_despeckle_pallas(packed, edge_mag, n0, n1, n2, bh=bh)
    return despeckle(quantize_packed(packed, n0, n1, n2), edge_mag)


def _disk_offsets(rmax, lo_sq, hi_sq):
    ker = np.zeros((2 * rmax + 1, 2 * rmax + 1), np.float32)
    for dy in range(-rmax, rmax + 1):
        for dx in range(-rmax, rmax + 1):
            if lo_sq <= dy * dy + dx * dx < hi_sq:
                ker[dy + rmax, dx + rmax] = 1.0
    return ker


def _dilate(mask, kernel_np):
    """Binary dilation by a 0/1 structuring element via conv (MXU)."""
    h, w = mask.shape
    k = jnp.asarray(kernel_np)[None, None]
    x = mask.astype(jnp.float32)[None, None]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1),
        padding=[(kernel_np.shape[0] // 2,) * 2,
                 (kernel_np.shape[1] // 2,) * 2])
    return y[0, 0] > 0.5


_RING_16_36 = _disk_offsets(6, 16, 36)    # mkMergeMask0, oclrect.cl:252-258
_DISK_64 = _disk_offsets(8, 0, 64)        # mkMergeMask1 ends, oclrect.cl:268
_DISK_16 = _disk_offsets(4, 0, 16)        # mkMergeMask1 junctions, :278


def merge_mask(junction):
    """mkMergeMask0 + mkMergeMask1 (oclrect.cl:246-287): force-merge ring
    around junctions, cleared near line ends (junction==2, disk r8) and
    junction cores (junction>2, disk r4)."""
    any_jn = junction != 0
    ends = junction == 2
    other = any_jn & ~ends
    m = _dilate(any_jn, _RING_16_36)
    clear = _dilate(ends, _DISK_64) | _dilate(other, _DISK_16)
    return (m & ~clear).astype(jnp.int32)


def junction_merge_mask(strong_lbl, x0=0, w_total: int | None = None):
    """simple_junction(positive_only) + merge_mask as one op.

    On TPU dispatches to the fused Pallas kernel (ops/pallas_morph.py):
    the three structuring-element dilations run as VMEM rolls instead of
    1-channel convs (the conv formulation puts a 128x128 systolic array
    on single-channel data — measured ~110 ms at 720p vs ~2 ms fused).
    x0/w_total: global-x offset for halo-widened width tiles — only the
    junction's interior test is border-sensitive (the dilations read
    zeros beyond the frame either way)."""
    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_morph import merge_mask_pallas
        return merge_mask_pallas(strong_lbl, x0=x0, w_total=w_total)
    from rectdetect_tpu.ops.morphology import simple_junction
    return merge_mask(simple_junction(strong_lbl, positive_only=True,
                                      x0=x0, w_total=w_total))


def _merge_pairs(packed, mask, edge_label, x0=0,
                 w_total: int | None = None):
    """Symmetric mergeability of horizontally/vertically adjacent pixels
    under labelMergeMain's rules (oclrect.cl:300-334) plus the
    unconditional labelxPreprocess seed links (oclrect.cl:289-298).

    For the pair (a, b) with b right of / below a, the kernel's four
    directional attempts collapse to:
        edge_label[b] <= 0  AND  (colors equal OR mask[a] OR mask[b])
    with the merging pixel interior; preprocess adds color-equal links
    regardless of edges/masks/interior (up always, left only when the up
    pixel differs).  Returns (mh (H, W-1), mv (H-1, W)) bool.

    x0/w_total: interior in TRUE frame coords for width tiles."""
    h, w = packed.shape
    eq_h = packed[:, 1:] == packed[:, :-1]
    eq_v = packed[1:, :] == packed[:-1, :]
    m = mask != 0
    blocked_h = edge_label[:, 1:] > 0          # edge at the right pixel
    blocked_v = edge_label[1:, :] > 0          # edge at the lower pixel

    from rectdetect_tpu.ops.ccl import interior_mask
    interior = interior_mask(h, w, 1, x0, w_total)

    # each directional attempt separately: the merging pixel must be
    # interior and supplies the mask term (oclrect.cl:306-331)
    mh = ~blocked_h & (
        (interior[:, :-1] & (eq_h | m[:, :-1])) |    # a merges right
        (interior[:, 1:] & (eq_h | m[:, 1:])))       # b merges left
    mv = ~blocked_v & (
        (interior[:-1, :] & (eq_v | m[:-1, :])) |    # a merges down
        (interior[1:, :] & (eq_v | m[1:, :])))       # b merges up

    # preprocess seeds (oclrect.cl:293-296): up link whenever equal; left
    # link only when the up pixel differs (the elif)
    up_eq_full = jnp.zeros((h, w), bool).at[1:, :].set(eq_v)
    mh = mh | (eq_h & ~up_eq_full[:, 1:])
    mv = mv | eq_v
    return mh, mv


def _segmented_min_1d(vals, link):
    """Per-row segmented min over maximal runs: vals (..., W) int32,
    link (..., W-1) bool (True = position x connected to x+1).
    Gather-free: two associative scans."""
    def seg_op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, jnp.minimum(av, bv), bv), af & bf

    ax = vals.ndim - 1
    f_fwd = jnp.concatenate(
        [jnp.zeros(vals.shape[:-1] + (1,), bool), link], axis=-1)
    fwd, _ = jax.lax.associative_scan(seg_op, (vals, f_fwd), axis=ax)
    f_bwd = jnp.concatenate(
        [link, jnp.zeros(vals.shape[:-1] + (1,), bool)], axis=-1)
    bwd, _ = jax.lax.associative_scan(seg_op, (vals, f_bwd), axis=ax,
                                      reverse=True)
    return jnp.minimum(fwd, bwd)


def label_merge(packed, mask, edge_label, n_passes: int = 8,
                n_jumps: int = 8, n_rounds: int = 12, x0=0,
                w_total: int | None = None, bh: int | None = None):
    """Region-merge CCL with min-flat-index labels (labelxPreprocess +
    labelMergeMain, oclrect.cl:289-334).

    TPU formulation: alternating row/column segmented-min scans over the
    symmetric pair-mergeability graph — zero gathers (the reference's
    atomic-min + pointer jumping needs 72 serial 1M-element gathers).
    Each round floods every maximal horizontal run then every vertical
    run; convergence depth is the row/column alternation depth of the
    region shapes.  The rounds run to the exact fixpoint (early-exit
    while_loop, static cap 2*(h+w)) — real photo segmentations need >12
    alternations (round-3 photo-corpus finding: a 24%-dense photo region
    map under-merged at the old fixed 12 rounds, splitting the gt quad's
    boundary group).  n_passes/n_jumps/n_rounds are accepted for API
    compatibility.

    On TPU this dispatches to the Pallas exact links-mode CCL
    (ops/pallas_ccl.py): the same row/column scans run to their fixpoint
    in VMEM, so the result is exact for any region shape and the rounds
    knob disappears."""
    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_ccl import label_merge_exact
        return label_merge_exact(packed, mask, edge_label, bh=bh, x0=x0,
                                 w_total=w_total)
    h, w = packed.shape
    mh, mv = _merge_pairs(packed, mask, edge_label, x0, w_total)
    label = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)

    def one_round(label):
        label = _segmented_min_1d(label, mh)
        label = _segmented_min_1d(label.T, mv.T).T
        return label

    cap = jnp.int32(2 * (h + w))

    def cond(c):
        _, changed, it = c
        return changed & (it < cap)

    def body(c):
        lbl, _, it = c
        new = one_round(lbl)
        return new, jnp.any(new != lbl), it + 1

    label, _, _ = jax.lax.while_loop(
        cond, body, (label, jnp.bool_(True), jnp.int32(0)))
    return label.astype(jnp.int32)


def label_merge_jump(packed, mask, edge_label, n_passes: int = 8,
                     n_jumps: int = 8):
    """The direct transcription of labelMergeMain (atomic-min -> scatter
    min + pointer jumping); kept for validation and as a fallback for
    pathological region shapes."""
    h, w = packed.shape
    n = h * w
    idx2d = jnp.arange(n, dtype=jnp.int32).reshape(h, w)

    up_same = jnp.zeros((h, w), bool).at[1:, :].set(
        packed[1:, :] == packed[:-1, :])
    left_same = jnp.zeros((h, w), bool).at[:, 1:].set(
        packed[:, 1:] == packed[:, :-1])
    label = jnp.where(up_same, idx2d - w,
                      jnp.where(left_same, idx2d - 1, idx2d))

    yy, xx = _coord_maps(h, w)
    interior = (yy >= 1) & (yy < h - 1) & (xx >= 1) & (xx < w - 1)

    pk = pad2d(packed, 1, "zero", constant=-12345)
    eg = pad2d(edge_label, 1, "zero", constant=0)
    blocked_here = edge_label > 0
    mask_set = mask != 0

    def one_pass(label):
        lbl2d = label.reshape(h, w)
        lp = pad2d(lbl2d, 1, "zero", constant=n)
        g = lbl2d
        for dy, dx, edge_at_nb in ((-1, 0, False), (0, -1, False),
                                   (0, 1, True), (1, 0, True)):
            cand = shifted(lp, 1, dy, dx, h, w)
            same = (shifted(pk, 1, dy, dx, h, w) == packed) | mask_set
            if edge_at_nb:
                blk = shifted(eg, 1, dy, dx, h, w) > 0
            else:
                blk = blocked_here
            ok = same & ~blk & interior
            g = jnp.minimum(g, jnp.where(ok, cand, n))
        g = g.reshape(-1)
        ext = jnp.concatenate([label, jnp.asarray([n], jnp.int32)])
        for _ in range(n_jumps):
            g = ext[g]
        og = label
        new = label.at[og].min(g, mode="drop")
        return jnp.minimum(new, g)

    label = label.reshape(-1)
    for _ in range(n_passes):
        label = one_pass(label)
    ext = jnp.concatenate([label, jnp.asarray([n], jnp.int32)])
    for _ in range(4):
        ext = ext[ext]
    return ext[:-1].reshape(h, w).astype(jnp.int32)


def label_sizes(label):
    """calcSize (oclrect.cl:336-348): histogram over all labels (no
    background here)."""
    h, w = label.shape
    n = h * w
    lbl = label.reshape(-1)
    tgt = jnp.clip(lbl, 0, n - 1)
    return jnp.zeros((n,), jnp.int32).at[tgt].add(1)


def despeckle2(label, sizes, thre: int = 16, sz_at=None):
    """Components <= thre px absorb the largest 3x3 neighbor label
    (despeckle2, oclrect.cl:350-371); first-max in yy/xx scan order.

    sz_at: optional precomputed per-pixel component-size map (the
    run-length path in sizes_despeckle2 builds it without the full-frame
    gather); sizes is ignored then."""
    h, w = label.shape
    n = h * w
    yy, xx = _coord_maps(h, w)
    if sz_at is None:
        sz_at = sizes[jnp.clip(label, 0, n - 1)]
    small = sz_at <= thre

    # sizes[shifted(label)] == shifted(sizes[label]): ONE random gather
    # for the whole stencil instead of nine 921k-element table gathers
    # (each of those costs ~an order of magnitude more than a shift —
    # random scalar HBM access vs a fused VPU pass)
    lp = pad2d(label, 1, "zero", constant=0)
    sp_ = pad2d(sz_at, 1, "zero", constant=0)
    best_sz = jnp.zeros((h, w), jnp.int32)
    best_lb = label
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            inb = ((yy + dy >= 0) & (yy + dy < h) &
                   (xx + dx >= 0) & (xx + dx < w))
            cand = shifted(lp, 1, dy, dx, h, w)
            s = shifted(sp_, 1, dy, dx, h, w)
            take = inb & (s > best_sz)
            best_sz = jnp.where(take, s, best_sz)
            best_lb = jnp.where(take, cand, best_lb)
    return jnp.where(small, best_lb, label).astype(jnp.int32)


def sizes_despeckle2(label, thre: int = 16, run_factor: int = 16,
                     pin: int = 0):
    """Fused calcSize + despeckle2 (oclrect.cl:336-371) via a run-length
    region representation.

    The region label map is piecewise-constant along rows (two
    horizontally adjacent pixels of one region share its min-flat-index
    label), so calcSize decomposes over maximal same-label row runs:
    sizes[c] = sum of run lengths of c.  Runs measure ~2% of the frame
    on real segmentations, so both table passes — the size scatter-add
    and the per-pixel size gather-back despeckle2 needs — run at run
    count instead of pixel count.  The gather-back becomes a per-run
    gather plus a row-wise forward-fill scan (each run start carries its
    size; runs never cross row boundaries).  (A batched per-row-sort
    run extraction was tried and REVERTED: (h, w) lane-dim sorts
    measured ~2x slower than the single flat sort on TPU.)

    Replaces the two most expensive single ops of the region-merge block
    (one 921k-row scatter + one 921k-row gather -> ~2k-row ops + one
    sort + one scan at 720p; tools/prim_bench.py constants).  Exactly
    equal to despeckle2(label, label_sizes(label), thre): integer run
    lengths sum to the same histogram.  When the frame has more runs
    than the cap (adversarial near-checkerboard segmentations), a
    runtime cond falls back to the dense pair — always exact.

    run_factor: run-list capacity H*W//run_factor; 0 = dense pair.
    pin: 1 pins the run-length branch (batched mode — a vmapped cond
    would run both branches; run overflow then truncates, with each
    kept run clamped to one row so no size inflates), 2 pins dense.
    """
    h, w = label.shape
    n = h * w
    if not run_factor:
        return despeckle2(label, label_sizes(label), thre)
    run_cap = max(4096, n // run_factor)
    if run_cap >= n:
        return despeckle2(label, label_sizes(label), thre)

    start2d = jnp.concatenate(
        [jnp.ones((h, 1), bool), label[:, 1:] != label[:, :-1]], axis=1)
    start = start2d.reshape(-1)
    # run count via a plain reduction — the old full-frame rank cumsum
    # cost ~0.5 ms and only its last element was ever used
    nruns = jnp.sum(start.astype(jnp.int32))

    def runlength(_):
        flat = jnp.arange(n, dtype=jnp.int32)
        key = jnp.where(start, flat, jnp.int32(n))
        idx = jax.lax.sort([key], num_keys=1)[0][:run_cap]  # run starts
        valid = idx < n
        safe = jnp.clip(idx, 0, n - 1)
        # consecutive slots are consecutive runs in flat order, and runs
        # never cross rows (col 0 always starts one), so the run length
        # is the gap to the next start; the last live run ends at n
        nxt = jnp.concatenate([idx[1:], jnp.full((1,), n, jnp.int32)])
        # a run never exceeds one row; the clamp only matters under a
        # pinned-overflowing list, where the last kept run would
        # otherwise span to the end of the frame
        rlen = jnp.where(valid,
                         jnp.minimum(jnp.minimum(nxt, n) - idx, w), 0)
        lbl_r = label.reshape(-1)[safe]                  # one run gather
        tgt = jnp.where(valid, jnp.clip(lbl_r, 0, n - 1), n)
        sizes = jnp.zeros((n + 1,), jnp.int32).at[tgt].add(
            rlen, mode="drop")[:n]
        sz_r = sizes[jnp.clip(lbl_r, 0, n - 1)]          # one run gather
        # sentinel thre+1 (not 0): under a pinned-overflowing run list
        # (pin=1) runs beyond run_cap get no szmap entry — a 0 there
        # would classify every pixel past the cap point as "small" and
        # let it absorb 3x3 neighbor labels; thre+1 conservatively
        # treats unfilled runs as large and leaves them unchanged
        szmap = jnp.full((n + 1,), thre + 1, jnp.int32).at[
            jnp.where(valid, idx, n)].set(sz_r, mode="drop")[:n]

        def op(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, av), af | bf

        sz_at, _ = jax.lax.associative_scan(
            op, (szmap.reshape(h, w), start2d), axis=1)
        return despeckle2(label, None, thre, sz_at=sz_at)

    def dense(_):
        return despeckle2(label, label_sizes(label), thre)

    if pin == 1:
        return runlength(None)
    if pin == 2:
        return dense(None)
    return jax.lax.cond(nruns <= run_cap, runlength, dense, None)


def color_reassign(packed, label):
    """Replace every pixel's color with its region's mean color
    (colorReassign_pass0/1, oclrect.cl:392-424 — present but disabled in
    the reference's pipeline, oclrect.c:346-359; provided for capability
    parity and debug rendering).  Uses the same x128 fixed-point
    accumulation."""
    h, w = packed.shape
    n = h * w
    lab = color.unpack_labf(packed)
    lbl = label.reshape(-1)
    ok = lbl >= 0
    tgt = jnp.where(ok, jnp.clip(lbl, 0, n - 1), n)
    acc = jnp.zeros((n + 1, 3), jnp.int32)
    fx = jnp.trunc(lab.reshape(-1, 3) * 128.0).astype(jnp.int32)
    acc = acc.at[tgt].add(jnp.where(ok[:, None], fx, 0), mode="drop")
    cnt = jnp.zeros((n + 1,), jnp.int32).at[tgt].add(
        jnp.where(ok, 1, 0), mode="drop")
    mean = acc[tgt].astype(jnp.float32) / \
        jnp.maximum(cnt[tgt, None].astype(jnp.float32) * 128.0, 1.0)
    out = jnp.where(ok[:, None], mean, lab.reshape(-1, 3))
    return color.pack_lab(out.reshape(h, w, 3))


def mark_boundary(label):
    """Pixels within 2 px of a different region keep their label, others
    get -1 (markBoundary, oclrect.cl:373-390); 2px borders are -1."""
    h, w = label.shape
    yy, xx = _coord_maps(h, w)
    interior = (yy >= 2) & (yy < h - 2) & (xx >= 2) & (xx < w - 2)
    lp = pad2d(label, 2, "edge")
    diff = jnp.zeros((h, w), bool)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            diff = diff | (shifted(lp, 2, dy, dx, h, w) != label)
    return jnp.where(interior & diff, label, -1).astype(jnp.int32)
