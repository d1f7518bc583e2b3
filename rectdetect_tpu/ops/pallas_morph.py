"""Fused Pallas morphology: junction -> gap bridge -> stringify x2 (and the
poly-pipeline variant with branch removal) in one VMEM pass.

The XLA formulation (ops/morphology.py) materializes a padded copy per
stencil; the chain is 4-5 dependent 3x3-ish stencils, so each block here
computes the whole chain on a (bh + 2*halo) row window and writes the
middle bh rows — intermediate maps never touch HBM.

Cross-block halos use globally pre-shifted inputs (the blblur trick —
Pallas BlockSpecs cannot overlap): for halo q, block i of `roll(x, q, 0)`
covers rows [i*bh - q, (i+1)*bh - q) and block i of `roll(x, -q, 0)`
covers [i*bh + q, (i+1)*bh + q); concatenating the first with the tail of
the second reconstructs rows [i*bh - q, (i+1)*bh + q).  Wrapped rows are
masked to background by the global row index.

References: simpleJunction oclpolyline.cl:66-87 / oclrect.cl:74-95,
simpleConnect oclpolyline.cl:89-110 / oclrect.cl:97-121, stringify
oclpolyline.cl:112-124, removeBranch oclpolyline.cl:126-147.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rectdetect_tpu.ops.shifts import NEIGH8
from rectdetect_tpu.ops import vmem

_HALO = 8          # chain depth 4-5; multiple of 8 keeps the i32
                   # sublane tiling happy
_HALO_B2 = 16      # +3 stencil depth when the connect2 extension is on
_BLOCK_ROWS = 128


def _morph_kernel(top_ref, bot_ref, xg_ref, out_ref, *, h: int, w: int,
                  bh: int, variant: str, wt: int, bridge2: bool):
    """wt / xg_ref: TRUE frame width and per-column global x (equal to
    the local column index in the single-chip case) — the interior masks
    and the stringify checkerboard are frame-global, so a halo-widened
    width tile (dist/tile.py) passes its offset column map here."""
    blk = pl.program_id(0)
    q = _HALO_B2 if bridge2 else _HALO
    eh = bh + 2 * q
    top = top_ref[:]                       # rows [i*bh - q, (i+1)*bh - q)
    bot = bot_ref[:]                       # rows [i*bh + q, (i+1)*bh + q)
    x = jnp.concatenate([top, bot[bh - 2 * q:]], axis=0)  # (eh, w)

    ly = jax.lax.broadcasted_iota(jnp.int32, (eh, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (eh, w), 1)
    xg = xg_ref[:]                         # (1, w) global x per column
    yy = ly + blk * bh - q
    inframe = (yy >= 0) & (yy < h)
    x = jnp.where(inframe, x, 0)

    def sh(arr, dy: int, dx: int):
        """arr[y+dy, x+dx] with zero fill (frame-edge semantics are
        enforced by the interior masks, as in ops/morphology.py)."""
        v = arr
        if dy:
            v = jnp.roll(v, -dy, 0)
        if dx:
            v = jnp.roll(v, -dx, 1)
        ok = (yy + dy >= 0) & (yy + dy < h)
        if dx:
            ok &= (xx + dx >= 0) & (xx + dx < w)
        return jnp.where(ok, v, 0)

    def interior(m: int):
        return ((yy >= m) & (yy < h - m) & (xg >= m) & (xg < wt - m))

    # simple_junction (positive_only on already-binary input == != 0)
    nz = (x != 0).astype(jnp.int32)
    cnt = nz * 0
    for dy, dx in NEIGH8:
        cnt = cnt + sh(nz, dy, dx)
    jn = jnp.where((nz != 0) & (cnt > 0), cnt + 1, 0)
    jn = jnp.where(interior(1), jn, 0)

    def n(dy, dx):
        return sh(jn, dy, dx)

    set0 = jn != 0
    if variant == "rect":
        bridge = ((n(0, -1) == 2) & (n(0, 1) != 0))
        bridge |= ((n(0, -1) != 0) & (n(0, 1) == 2))
        bridge |= ((n(-1, 0) == 2) & (n(1, 0) != 0))
        bridge |= ((n(-1, 0) != 0) & (n(1, 0) == 2))
        bridge |= ((n(-1, -1) == 2) & (n(1, 1) == 2))
        bridge |= ((n(-1, 1) == 2) & (n(1, -1) == 2))
        bridge |= ((n(0, 1) == 2) & (n(1, -1) == 2))
        bridge |= ((n(0, -1) == 2) & (n(1, 1) == 2))
        bridge |= ((n(-1, 1) == 2) & (n(1, 0) == 2))
        bridge |= ((n(-1, -1) == 2) & (n(1, 0) == 2))
    else:
        bridge = ((n(0, -2) != 0) & (n(0, -1) == 2) & (n(0, 1) == 2) &
                  (n(0, 2) != 0))
        bridge |= ((n(-2, 0) != 0) & (n(-1, 0) == 2) & (n(1, 0) == 2) &
                   (n(2, 0) != 0))
        bridge |= ((n(-2, -2) != 0) & (n(-1, -1) == 2) & (n(1, 1) == 2) &
                   (n(2, 2) != 0))
        bridge |= ((n(-2, 2) != 0) & (n(-1, 1) == 2) & (n(1, -1) == 2) &
                   (n(2, -2) != 0))
        bridge |= ((n(0, 2) != 0) & (n(0, 1) == 2) & (n(1, -1) == 2) &
                   (n(1, -2) != 0))
        bridge |= ((n(0, -2) != 0) & (n(0, -1) == 2) & (n(1, 1) == 2) &
                   (n(1, 2) != 0))
        bridge |= ((n(-2, 1) != 0) & (n(-1, 1) == 2) & (n(1, 0) == 2) &
                   (n(2, 0) != 0))
        bridge |= ((n(-2, -1) != 0) & (n(-1, -1) == 2) & (n(1, 0) == 2) &
                   (n(2, 0) != 0))
    conn = jnp.where((set0 | bridge) & interior(2), 1, 0)

    if bridge2:
        # simple_connect2 (ops/morphology.py): close straight 2-px gaps
        # between chain ends — the staircase holes the reference's
        # thinning leaves on shallow-slope edges
        nzc = (conn != 0).astype(jnp.int32)
        cnt2 = nzc * 0
        for dy, dx in NEIGH8:
            cnt2 = cnt2 + sh(nzc, dy, dx)
        deg = jnp.where(nzc != 0, cnt2 + 1, 0)

        def d(dy, dx):
            return sh(deg, dy, dx)

        fill = conn < -1                     # all-False, right shape
        for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
            fill = fill | ((d(-dy, -dx) == 2) & (d(2 * dy, 2 * dx) == 2))
            fill = fill | ((d(-2 * dy, -2 * dx) == 2) & (d(dy, dx) == 2))
        conn = jnp.where(((conn != 0) | fill) & interior(2), 1, 0)

    def stringify(img, parity: int):
        corner = (((sh(img, -1, 0) != 0) & (sh(img, 0, -1) != 0)) |
                  ((sh(img, -1, 0) != 0) & (sh(img, 0, 1) != 0)) |
                  ((sh(img, 1, 0) != 0) & (sh(img, 0, -1) != 0)) |
                  ((sh(img, 1, 0) != 0) & (sh(img, 0, 1) != 0)))
        on_parity = ((yy + xg) & 1) == parity
        return jnp.where(on_parity & corner & interior(1), 0, img)

    s = stringify(stringify(conn, 0), 1)

    if variant == "poly_branch":
        nzs = (s != 0).astype(jnp.int32)
        cnt2 = nzs * 0
        for dy, dx in NEIGH8:
            cnt2 = cnt2 + sh(nzs, dy, dx)
        s = jnp.where((nzs != 0) & (cnt2 <= 2) & interior(1), 1, 0)

    out_ref[:] = s[q:q + bh].astype(jnp.int32)


def _quant_despeckle_kernel(ptop_ref, pbot_ref, etop_ref, ebot_ref,
                            out_ref, *, h: int, w: int, bh: int,
                            n0: int, n1: int, n2: int):
    """quantize (oclrect.cl:207-216) + despeckle (oclrect.cl:218-244) on a
    haloed block: on-edge pixels take the nearest-color off-edge 3x3
    neighbor of the quantized image."""
    blk = pl.program_id(0)
    q = _HALO
    eh = bh + 2 * q
    packed = jnp.concatenate([ptop_ref[:], pbot_ref[:][bh - 2 * q:]], 0)
    emag = jnp.concatenate([etop_ref[:], ebot_ref[:][bh - 2 * q:]], 0)

    ly = jax.lax.broadcasted_iota(jnp.int32, (eh, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (eh, w), 1)
    yy = ly + blk * bh - q
    inframe = (yy >= 0) & (yy < h)
    packed = jnp.where(inframe, packed, 0)

    # quantize: unpack to lattice-center floats, snap to n levels, repack
    cl = packed & 0xFFF
    ca = (packed >> 12) & 0x3FF
    cb = (packed >> 22) & 0x3FF
    lf = (cl.astype(jnp.float32) + 0.5) * (1.0 / 4096.0)
    af = (ca.astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    bf = (cb.astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    qlf = jnp.floor(lf * n0 + 0.5) * (1.0 / n0)
    qaf = jnp.floor(af * n1 + 0.5) * (1.0 / n1)
    qbf = jnp.floor(bf * n2 + 0.5) * (1.0 / n2)
    pq = ((jnp.clip(jnp.floor(qbf * 1024.0), 0, 1023).astype(jnp.int32)
           << 22) |
          (jnp.clip(jnp.floor(qaf * 1024.0), 0, 1023).astype(jnp.int32)
           << 12) |
          jnp.clip(jnp.floor(qlf * 4096.0), 0, 4095).astype(jnp.int32))

    cl = pq & 0xFFF
    ca = (pq >> 12) & 0x3FF
    cb = (pq >> 22) & 0x3FF
    lf = (cl.astype(jnp.float32) + 0.5) * (1.0 / 4096.0)
    af = (ca.astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    bf = (cb.astype(jnp.float32) + 0.5) * (1.0 / 1024.0)

    on_edge = (emag >= 1e-6).astype(jnp.int32)

    def sh(arr, dy: int, dx: int, fill):
        v = arr
        if dy:
            v = jnp.roll(v, -dy, 0)
        if dx:
            v = jnp.roll(v, -dx, 1)
        ok = (yy + dy >= 0) & (yy + dy < h)
        if dx:
            ok &= (xx + dx >= 0) & (xx + dx < w)
        return jnp.where(ok, v, fill)

    best_d = jnp.full((eh, w), 1e10, jnp.float32)
    best = pq
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cand_edge = sh(on_edge, dy, dx, 1)
            d = jnp.sqrt((sh(lf, dy, dx, 0.0) - lf) ** 2 +
                         (sh(af, dy, dx, 0.0) - af) ** 2 +
                         (sh(bf, dy, dx, 0.0) - bf) ** 2)
            take = (cand_edge == 0) & (d < best_d)
            best_d = jnp.where(take, d, best_d)
            best = jnp.where(take, sh(pq, dy, dx, 0), best)
    out = jnp.where(on_edge != 0, best, pq)
    out_ref[:] = out[q:q + bh]


@functools.partial(jax.jit, static_argnames=("n0", "n1", "n2", "bh"))
def quant_despeckle_pallas(packed, edge_mag, n0: int = 24, n1: int = 24,
                           n2: int = 24, bh: int = 64):
    """Fused quantize_packed + despeckle, bit-exact vs the composition
    (same sqrt distance domain, same neighbor iteration order)."""
    h, w = packed.shape
    q = _HALO
    if not vmem.min_window_fits("quant_despeckle", w, halo=q,
                                min_rows=2 * q):
        # minimal block over the VMEM budget (>=3200 px wide): run the
        # same kernel over width chunks with real halo columns; the
        # despeckle stencil reaches 1 px, so an 8-col halo is exact
        cw, halo = 2048, 8
        outs = []
        for cx in range(0, w, cw):
            lo, hi = max(0, cx - halo), min(w, cx + cw + halo)
            part = quant_despeckle_pallas(packed[:, lo:hi],
                                          edge_mag[:, lo:hi],
                                          n0, n1, n2, bh)
            outs.append(part[:, cx - lo:cx - lo + min(cw, w - cx)])
        return jnp.concatenate(outs, axis=1)
    p = packed.astype(jnp.int32)
    e = edge_mag.astype(jnp.float32)
    # the two rolled copies only cover the (bh + 2q) window when bh >= 2q
    bh = vmem.pick_block_rows("quant_despeckle", bh, w, halo=q,
                              min_rows=2 * q, h=h)
    nb = pl.cdiv(h, bh)
    h2 = nb * bh
    if h2 != h:
        p = jnp.pad(p, ((0, h2 - h), (0, 0)))
        e = jnp.pad(e, ((0, h2 - h), (0, 0)))
    args = [jnp.roll(p, q, 0), jnp.roll(p, -q, 0),
            jnp.roll(e, q, 0), jnp.roll(e, -q, 0)]
    ispec = pl.BlockSpec((bh, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    interpret = jax.default_backend() not in ("tpu",)
    out = pl.pallas_call(
        functools.partial(_quant_despeckle_kernel, h=h, w=w, bh=bh,
                          n0=n0, n1=n1, n2=n2),
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.int32),
        grid=(nb,),
        in_specs=[ispec] * 4,
        out_specs=ispec,
        interpret=interpret,
        compiler_params=vmem.compiler_params(),
    )(*args)
    return out[:h]


@functools.partial(jax.jit,
                   static_argnames=("variant", "bh", "w_total", "bridge2"))
def morph_chain_pallas(edge_bin, variant: str = "rect",
                       bh: int = _BLOCK_ROWS, x0=0,
                       w_total: int | None = None, bridge2: bool = False):
    """edge_bin (H, W) int32 binary -> strings map, bit-exact vs the
    composed ops/morphology.py chain.

    variant: "rect" = junction+connect_rect+stringify x2 (oclrect.c:265-272),
    "poly" = junction+connect_poly+stringify x2, "poly_branch" = poly plus
    removeBranch (the poly-pipeline prefix, oclpolyline.c stages 1-4).
    x0/w_total: global-x offset + true frame width for halo-widened width
    tiles (dist/tile.py) — enters as a column-map input (x0 is traced).
    """
    h, w = edge_bin.shape
    wt = w if w_total is None else w_total
    xg_row = (jnp.arange(w, dtype=jnp.int32)[None, :] + x0)
    x = edge_bin.astype(jnp.int32)
    q = _HALO_B2 if bridge2 else _HALO
    # budgets differ by live-buffer count: bridge2 adds the connect2
    # degree map + fill taps, poly_branch adds the removeBranch degree
    # map (the 36 KB-over OOM of the first r02 bench run) — key the
    # measured budget by both (ops/vmem.py)
    kname = "morph_chain"
    if variant == "poly_branch":
        kname += "_branch"
    if bridge2:
        kname += "_bridge2"
    if not vmem.min_window_fits(kname, w, halo=q, min_rows=2 * q):
        # the minimal legal block (bh = 2q) would already exceed the
        # VMEM budget (bridge2's deeper halo at >=4K widths): run the
        # SAME fused kernel over width chunks, each padded with real
        # halo columns sliced from its neighbors and the global-x
        # column map offset accordingly — bit-exact by the same
        # halo-decay argument as the width-tiled path (dist/tile.py)
        cw = 2048
        halo = 16                       # stencil depth 9, tiling-friendly
        outs = []
        for cx in range(0, w, cw):
            lo = max(0, cx - halo)
            hi = min(w, cx + cw + halo)
            chunk = edge_bin[:, lo:hi]
            part = morph_chain_pallas(chunk, variant, bh,
                                      x0=x0 + lo, w_total=wt,
                                      bridge2=bridge2)
            outs.append(part[:, cx - lo:cx - lo + min(cw, w - cx)])
        return jnp.concatenate(outs, axis=1)
    # bh >= 2q so the two rolled copies cover the (bh + 2q) window;
    # the 720p default bh=128 sits just under the measured budget;
    # 1080p OOMs without the clamp
    bh = vmem.pick_block_rows(kname, bh, w, halo=q, min_rows=2 * q, h=h)
    nb = pl.cdiv(h, bh)
    # pad to whole blocks BEFORE rolling: a trailing partial block would
    # otherwise read undefined out-of-bounds rows of the rolled inputs
    # (in-frame ext rows can map there, so the yy mask cannot catch it)
    h2 = nb * bh
    if h2 != h:
        x = jnp.pad(x, ((0, h2 - h), (0, 0)))
    top = jnp.roll(x, q, axis=0)
    bot = jnp.roll(x, -q, axis=0)
    spec = pl.BlockSpec((bh, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    interpret = jax.default_backend() not in ("tpu",)
    out = pl.pallas_call(
        functools.partial(_morph_kernel, h=h, w=w, bh=bh, variant=variant,
                          wt=wt, bridge2=bridge2),
        out_shape=jax.ShapeDtypeStruct((h2, w), jnp.int32),
        grid=(nb,),
        in_specs=[spec, spec, rspec],
        out_specs=spec,
        interpret=interpret,
        compiler_params=vmem.compiler_params(),
    )(top, bot, xg_row)
    return out[:h]


# ---------------------------------------------------------------------------
# Fused junction + merge mask (mkMergeMask0/1).  The XLA formulation runs
# the three disk/ring dilations as 1-channel convs — MXU-hostile (measured
# ~110 ms at 720p); here every structuring-element tap is a VMEM roll.
# ---------------------------------------------------------------------------

_MM_HALO = 9  # junction stencil (1) + disk radius (8)


def _se_runs():
    """Per-dy contiguous dx runs of the three structuring elements.

    ring: 16 <= d^2 < 36 (mkMergeMask0); d64: d^2 < 64 on jn == 2;
    d16: d^2 < 16 on jn > 2 (mkMergeMask1)."""
    def runs(pred, rmax):
        out = []
        for dy in range(-rmax, rmax + 1):
            xs = [dx for dx in range(-rmax, rmax + 1) if pred(dy, dx)]
            if not xs:
                continue
            rs, a = [], None
            for dx in xs:
                if a is None:
                    a = b = dx
                elif dx == b + 1:
                    b = dx
                else:
                    rs.append((a, b))
                    a = b = dx
            rs.append((a, b))
            out.append((dy, rs))
        return out
    ring = runs(lambda dy, dx: 16 <= dy * dy + dx * dx < 36, 5)
    d64 = runs(lambda dy, dx: dy * dy + dx * dx < 64, 7)
    d16 = runs(lambda dy, dx: dy * dy + dx * dx < 16, 3)
    return ring, d64, d16


_SE_RING, _SE_D64, _SE_D16 = _se_runs()


def _merge_mask_kernel(top_ref, bot_ref, xok_ref, out_ref, *, h: int,
                       w: int, bh: int, q: int):
    """strong-label block -> merge mask middle rows.

    Dilations run as log-depth window-OR pyramids along x (each disk row
    is a contiguous dx run = two pyramid taps) + one y-roll per row —
    ~160 VPU ops and ~13 live block buffers (a flat 225-tap unroll kept
    >60 buffers live and blew the 16 MB VMEM scoped stack).  The input is
    zero-padded in x outside the kernel so taps are bare rolls; jn is
    zero outside the frame interior by construction, so wrapped rolls
    never contribute.

    References: simpleJunction oclrect.cl:74-95, mkMergeMask0
    oclrect.cl:246-258, mkMergeMask1 oclrect.cl:260-287."""
    blk = pl.program_id(0)
    eh = bh + 2 * q
    x = jnp.concatenate([top_ref[:], bot_ref[:][bh - 2 * q:]], axis=0)
    wp = x.shape[1]

    ly = jax.lax.broadcasted_iota(jnp.int32, (eh, wp), 0)
    yy = ly + blk * bh - q
    # x-interior arrives as a per-column validity row (frame-global in
    # the width-tiled case; equal to q+1 <= x < q+w-1 single-chip)
    interior1 = (yy >= 1) & (yy < h - 1) & (xok_ref[:] != 0)

    def sh(arr, dy: int, dx: int):
        v = arr
        if dy:
            v = jnp.roll(v, -dy, 0)
        if dx:
            v = jnp.roll(v, -dx, 1)
        return v

    nz = (x > 0).astype(jnp.int32)
    cnt = nz * 0
    for dy, dx in NEIGH8:
        cnt = cnt + sh(nz, dy, dx)
    jn = jnp.where((nz != 0) & (cnt > 0) & interior1, cnt + 1, 0)

    def dilate_runs(src, se):
        """OR over {(dy, dx runs)} of src taps via the x-window pyramid."""
        jmax = max(int(math.floor(math.log2(b - a + 1)))
                   for _, rs in se for a, b in rs)
        pyr = [src]                     # pyr[j][x] = OR src[x .. x+2^j-1]
        for j in range(jmax):
            pyr.append(pyr[-1] | sh(pyr[-1], 0, 1 << j))
        acc = jnp.zeros(src.shape, src.dtype)
        for dy, rs in se:
            row = None
            for a, b in rs:
                L = b - a + 1
                j = int(math.floor(math.log2(L)))
                r = sh(pyr[j], 0, a) | sh(pyr[j], 0, b - (1 << j) + 1)
                row = r if row is None else (row | r)
            acc = acc | sh(row, dy, 0)
        return acc

    m = dilate_runs((jn != 0).astype(jnp.int32), _SE_RING)
    clear = dilate_runs((jn == 2).astype(jnp.int32), _SE_D64)
    clear = clear | dilate_runs((jn > 2).astype(jnp.int32), _SE_D16)
    out_ref[:] = jnp.where(m != 0, jnp.where(clear != 0, 0, 1),
                           0)[q:q + bh]


def merge_mask_pallas(strong_lbl, bh: int = 64, x0=0,
                      w_total: int | None = None):
    """strong label map (H, W) int32 -> merge mask (H, W) int32 0/1.

    Fuses morphology.simple_junction(strong_lbl, positive_only=True) and
    regions.merge_mask; bit-exact vs the composition
    (tests/test_pallas_morph_mask.py).  x0/w_total: global-x offset +
    true frame width for halo-widened width tiles — only the junction's
    interior test is x-border-sensitive, so it enters as a per-column
    validity row."""
    h, w = strong_lbl.shape
    wt = w if w_total is None else w_total
    q = _MM_HALO
    wp = pl.cdiv(w + 2 * q, 128) * 128
    if not vmem.min_window_fits("merge_mask", wp, halo=q,
                                min_rows=2 * q + 6):
        # minimal block over the VMEM budget (>=2700 px wide): width
        # chunks with real halo columns (junction 1 + dilations 8 -> 16
        # is ample), global-x offsets keep the border guard exact
        cw, halo = 2048, 16
        outs = []
        for cx in range(0, w, cw):
            lo, hi = max(0, cx - halo), min(w, cx + cw + halo)
            part = merge_mask_pallas(strong_lbl[:, lo:hi], bh,
                                     x0=x0 + lo, w_total=wt)
            outs.append(part[:, cx - lo:cx - lo + min(cw, w - cx)])
        return jnp.concatenate(outs, axis=1)
    xg = jnp.arange(wp, dtype=jnp.int32)[None, :] - q + x0
    xok = ((xg >= 1) & (xg < wt - 1) &
           (jnp.arange(wp)[None, :] >= q) &
           (jnp.arange(wp)[None, :] < q + w)).astype(jnp.int32)
    x = strong_lbl.astype(jnp.int32)
    x = jnp.pad(x, ((0, 0), (q, wp - w - q)))
    bh = vmem.pick_block_rows("merge_mask", bh, wp, halo=q,
                              min_rows=2 * q + 6, h=h)
    nb = pl.cdiv(h, bh)
    h2 = nb * bh
    if h2 != h:
        x = jnp.pad(x, ((0, h2 - h), (0, 0)))
    top = jnp.roll(x, q, axis=0)
    bot = jnp.roll(x, -q, axis=0)
    spec = pl.BlockSpec((bh, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((1, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    interpret = jax.default_backend() not in ("tpu",)
    out = pl.pallas_call(
        functools.partial(_merge_mask_kernel, h=h, w=w, bh=bh, q=q),
        out_shape=jax.ShapeDtypeStruct((h2, wp), jnp.int32),
        grid=(nb,),
        in_specs=[spec, spec, rspec],
        out_specs=spec,
        interpret=interpret,
        compiler_params=vmem.compiler_params(),
    )(top, bot, xok)
    return out[:h, q:q + w]


# ---------------------------------------------------------------------------
# Distinct boundary ids in the 7x7 window (reduceLS slot scan).
# ---------------------------------------------------------------------------

_DB_HALO = 3


def _distinct_bids_kernel(top_ref, bot_ref, o0_ref, o1_ref, o2_ref, o3_ref,
                          *, h: int, bh: int, q: int):
    """Up to 4 distinct positive ids per pixel's 7x7 window, scan order
    (reduceLS, oclrect.cl:441-447).  Input is zero-padded in x and
    pre-shifted in y (top/bot roll trick), so every tap is a bare roll;
    rows wrapped in from the other end of the frame are zeroed by the
    global row mask, matching the XLA formulation's zero padding."""
    blk = pl.program_id(0)
    eh = bh + 2 * q
    x = jnp.concatenate([top_ref[:], bot_ref[:][bh - 2 * q:]], axis=0)
    wp = x.shape[1]
    ly = jax.lax.broadcasted_iota(jnp.int32, (eh, wp), 0)
    yy = ly + blk * bh - q
    x = jnp.where((yy >= 0) & (yy < h), x, 0)

    def shx(arr, dy: int, dx: int):
        v = arr
        if dy:
            v = jnp.roll(v, -dy, 0)
        if dx:
            v = jnp.roll(v, -dx, 1)
        return v

    zeros = jnp.zeros((eh, wp), jnp.int32)
    s = [zeros, zeros, zeros, zeros]
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            b = shx(x, dy, dx)
            fresh = b > 0
            for si in s:
                fresh = fresh & (si != b)
            for i in range(4):
                put = fresh & (s[i] == 0)
                s[i] = jnp.where(put, b, s[i])
                fresh = fresh & ~put
    sl = slice(q, q + bh)
    o0_ref[:] = s[0][sl]
    o1_ref[:] = s[1][sl]
    o2_ref[:] = s[2][sl]
    o3_ref[:] = s[3][sl]


def distinct_bids_pallas(boundary, bh: int = 64):
    """(H, W) int32 boundary ids -> 4 slot maps, bit-exact vs
    reduce_ls._distinct_bids with k_slots=4.

    The frame's y rows outside [0, H) and x cols outside [0, W) read as
    0 via the padding, identical to pad2d(..., 'zero')."""
    h, w = boundary.shape
    q = _DB_HALO
    wp = pl.cdiv(w + 2 * q, 128) * 128
    # clamp negatives (background -1) to 0 up front: only ids > 0 are
    # ever collected, and zero padding must be indistinguishable from bg
    x = jnp.maximum(boundary.astype(jnp.int32), 0)
    x = jnp.pad(x, ((0, 0), (q, wp - w - q)))
    bh = vmem.pick_block_rows("distinct_bids", bh, wp, halo=q,
                              min_rows=2 * q + 2, h=h)
    nb = pl.cdiv(h, bh)
    h2 = nb * bh
    if h2 != h:
        x = jnp.pad(x, ((0, h2 - h), (0, 0)))
    top = jnp.roll(x, q, axis=0)
    bot = jnp.roll(x, -q, axis=0)
    spec = pl.BlockSpec((bh, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    interpret = jax.default_backend() not in ("tpu",)
    outs = pl.pallas_call(
        functools.partial(_distinct_bids_kernel, h=h, bh=bh, q=q),
        out_shape=tuple(jax.ShapeDtypeStruct((h2, wp), jnp.int32)
                        for _ in range(4)),
        grid=(nb,),
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec, spec),
        interpret=interpret,
        compiler_params=vmem.compiler_params(),
    )(top, bot)
    return [o[:h, q:q + w] for o in outs]
