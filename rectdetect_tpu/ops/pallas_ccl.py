"""Pallas TPU kernels: exact connected-component labeling, two-level.

Replaces the gather-bound pointer-jumping CCL passes (the reference's
labelxPreprocess/label8xMain, oclimgutil.cl:495-538, and
labelpl_preprocess/labelpl_main, oclpolyline.cl:312-355) with a
TPU-native two-level scheme:

  1. block-local labeling fully converged *in VMEM*: each grid block
     (bh rows x full width) iterates {8-neighbor min, row segmented-min
     scan, column segmented-min scan} to its fixpoint with a
     `lax.while_loop` — pure VPU roll/select work, zero HBM round trips
     per iteration, zero gathers;
  2. a tiny union-find over the cross-block seam pairs (labels of
     8-connected pixels straddling block boundaries) — scatter-min +
     pointer jumping over ~3*W rows per seam instead of ~H*W/3;
  3. a second in-VMEM flood seeded with the resolved seam labels, which
     spreads the merges to block interiors (only components touching a
     seam can change).

Unlike the fixed-trip-count XLA formulation (ops/ccl.py), the result is
the *exact* fixpoint — min flat index per component — for any input, so
it is both deterministic and independent of iteration budgets.  The
fixed-pass path remains the CPU/testing fallback and oracle.

Modes share one kernel body:
  * "equal": 8-connected equal-pixel-value components, background `bgc`
    (label_components semantics);
  * "arc":   8-connected |number difference| <= 1, background number<=0
    (label_arcs / labelpl semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rectdetect_tpu.ops.shifts import NEIGH8
from rectdetect_tpu.ops import vmem

# ~12 live (bh, W) i32 temporaries inside the while body + pallas
# double-buffering must fit the 16 MB VMEM budget; 128k elements/array
# (= 512 KB i32) leaves ample headroom (measured headroom at 720p).
# block size is a measured PERF choice (not just legality): keep the
# 16 MiB-era block and use the raised kernel limit as safety margin
_BLOCK_ELEMS = vmem.budget_elems("ccl_flood", limit=vmem.VMEM_LIMIT_BYTES)


def _round_cap(bh: int, w: int) -> int:
    """Hard cap on in-block flood rounds.  Each round completes at least
    one full straight segment of any remaining geodesic (scans) plus one
    diagonal step (neighbor min), so real images converge in < 20 rounds
    and even adversarial serpentines in O(perimeter).  The cap exists to
    bound device occupancy on a shared chip — a kernel stuck for hours
    wedges the whole relay — not to define semantics; convergence is
    checked, the cap is 100x beyond anything observed.
    """
    return 4 * (bh + w)


def _pick_bh(h: int, w: int) -> int:
    bh = max(8, min(h, (_BLOCK_ELEMS // max(w, 1)) // 8 * 8))
    vmem.assert_fits("ccl_flood", bh * w)
    return bh


def _clamp_bh(bh: int | None, h: int, w: int) -> int | None:
    """Clamp a caller-supplied block height (per-instance config or the
    calibrated plan's ccl_bh, tuned at some reference width) to the
    largest legal block at THIS width — the trace-time assert in
    _run_blocks remains the backstop.

    At w=3840 blocks taller than 96 rows FAULT the TPU worker at
    runtime (Mosaic kernel fault, reproduced on the links kernel with
    bh=112 while bh<=96 runs fine and 224x1920 — the same element
    count — also runs fine); cap very wide frames at the measured-safe
    height."""
    if bh is None:
        return None
    cap = (vmem.budget_elems("ccl_flood") // max(w, 1)) // 8 * 8
    if w >= 2048:
        cap = min(cap, 96)
    return max(8, min(bh, cap, max(8, (h + 7) // 8 * 8)))


def _pred(mode: str, a, b):
    if mode == "equal":
        return a == b
    return jnp.abs(a - b) <= 1          # arc: |number diff| <= 1


def _fg(mode: str, pix, bgc: int):
    if mode == "equal":
        return pix != bgc
    return pix > 0


def _ccl_block_kernel(pix_ref, seed_ref, out_ref, rounds_ref, *, bgc: int,
                      mode: str, h: int, w: int, bh: int, seeded: bool,
                      round_cap: int | None, inner_nb: int):
    blk = pl.program_id(0)
    pix = pix_ref[:]
    ly = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
    yy = ly + blk * bh
    sent = jnp.int32(h * w)
    bgv = jnp.int32(bgc if mode == "equal" else 0)
    pixv = jnp.where(yy < h, pix, bgv)
    fg = _fg(mode, pixv, bgc)
    idx = yy * w + xx

    def sh(arr, dy: int, dx: int, fill):
        """out[y,x] = arr[y+dy, x+dx] within the block, else fill."""
        v = arr
        if dy:
            v = jnp.roll(v, -dy, 0)
        if dx:
            v = jnp.roll(v, -dx, 1)
        ok = None
        if dy:
            ok = (ly + dy >= 0) & (ly + dy < bh)
        if dx:
            okx = (xx + dx >= 0) & (xx + dx < w)
            ok = okx if ok is None else (ok & okx)
        return v if ok is None else jnp.where(ok, v, fill)

    if seeded:
        label = jnp.where(fg, seed_ref[:], sent)
    else:
        label = jnp.where(fg, idx, sent)

    # connectivity flags, int32 0/1 (Mosaic cannot roll/truncate i1
    # vectors, so every mask that gets shifted lives as i32)
    fg_i = fg.astype(jnp.int32)
    nb_ok = []
    for (dy, dx) in NEIGH8:
        ok = fg & (sh(fg_i, dy, dx, 0) != 0) & \
            _pred(mode, sh(pixv, dy, dx, bgv), pixv)
        nb_ok.append(ok.astype(jnp.int32))
    conn_l = nb_ok[NEIGH8.index((0, -1))]   # connected to (y, x-1)
    conn_u = nb_ok[NEIGH8.index((-1, 0))]   # connected to (y-1, x)

    def seg_scan(v, conn, sy: int, sx: int, reverse: bool, length: int):
        """Segmented running min along unit direction (sy, sx);
        conn[pos] = linked to the predecessor at (y-sy, x-sx).
        Hillis-Steele: log2(length) steps."""
        if reverse:
            f = sh(conn, sy, sx, 0)     # linked to the successor
        else:
            f = conn
        d = 1
        while d < length:
            step = d if reverse else -d
            v_sh = sh(v, sy * step, sx * step, sent)
            f_sh = sh(f, sy * step, sx * step, 0)
            v = jnp.where(f != 0, jnp.minimum(v, v_sh), v)
            f = f & f_sh
            d *= 2
        return v

    def one_round(lbl):
        g = lbl
        for _ in range(inner_nb):
            gn = g
            for ok, (dy, dx) in zip(nb_ok, NEIGH8):
                gn = jnp.minimum(gn, jnp.where(ok != 0, sh(g, dy, dx, sent),
                                               sent))
            g = gn
        g = seg_scan(g, conn_l, 0, 1, False, w)
        g = seg_scan(g, conn_l, 0, 1, True, w)
        g = seg_scan(g, conn_u, 1, 0, False, bh)
        g = seg_scan(g, conn_u, 1, 0, True, bh)
        # NOTE: diagonal seg scans were tried and reverted — measured
        # round counts on real string maps did NOT drop (convergence is
        # bounded by geodesic tortuosity of noise paths, which mix all
        # directions, not by stairstep runs), so they only added ~60%
        # per-round cost.
        return g

    cap = jnp.int32(_round_cap(bh, w) if round_cap is None else round_cap)

    def cond(c):
        _, changed, it = c
        return changed & (it < cap)

    def body(c):
        lbl, _, it = c
        new = one_round(lbl)
        return new, jnp.any(new != lbl), it + 1

    label, _, it = jax.lax.while_loop(
        cond, body, (label, jnp.bool_(True), jnp.int32(0)))
    out_ref[:] = label
    if rounds_ref is not None:
        rounds_ref[0, :, :] = jnp.full((8, 128), it, jnp.int32)


def _run_blocks(pix, seed, *, bgc: int, mode: str, bh: int, interpret: bool,
                round_cap: int | None = None, inner_nb: int = 1,
                want_rounds: bool = False):
    h, w = pix.shape
    vmem.assert_fits("ccl_flood", bh * w)   # incl. caller-supplied bh
    nb = pl.cdiv(h, bh)
    spec = pl.BlockSpec((bh, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    seeded = seed is not None
    if seed is None:
        seed = pix                      # unused placeholder, same spec
    args = (pix.astype(jnp.int32), seed.astype(jnp.int32))
    if not want_rounds:
        kern = functools.partial(_ccl_block_kernel, rounds_ref=None,
                                 bgc=bgc, mode=mode, h=h, w=w, bh=bh,
                                 seeded=seeded,
                                 round_cap=round_cap, inner_nb=inner_nb)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
            grid=(nb,),
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=interpret,
        compiler_params=vmem.compiler_params(),
        )(*args)
    # diagnostic variant: per-block round counts as a tiled VMEM output
    kern = functools.partial(_ccl_block_kernel, bgc=bgc, mode=mode,
                             h=h, w=w, bh=bh, seeded=seeded,
                             round_cap=round_cap, inner_nb=inner_nb)
    rspec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out, rounds = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((h, w), jnp.int32),
                   jax.ShapeDtypeStruct((nb, 8, 128), jnp.int32)),
        grid=(nb,),
        in_specs=[spec, spec],
        out_specs=(spec, rspec),
        interpret=interpret,
        compiler_params=vmem.compiler_params(),
    )(*args)
    return out, rounds[:, 0, 0]


def _seam_union(pix, lbl, *, bgc: int, mode: str, bh: int):
    """Resolve cross-block merges: union-find over seam-straddling pairs.

    Returns the root table t (N+1,) with t[sent] = sent; after
    convergence every pair (a, b) satisfies jump(t, a) == jump(t, b).
    """
    h, w = pix.shape
    n = h * w
    sent = jnp.int32(n)
    rows = list(range(bh - 1, h - 1, bh))           # top row of each seam
    top_p = jnp.stack([pix[r] for r in rows])
    bot_p = jnp.stack([pix[r + 1] for r in rows])
    top_l = jnp.stack([lbl[r] for r in rows])
    bot_l = jnp.stack([lbl[r + 1] for r in rows])
    fg_t = _fg(mode, top_p, bgc)
    fg_b = _fg(mode, bot_p, bgc)

    a_all, b_all = [], []
    for dx in (-1, 0, 1):
        bp = jnp.roll(bot_p, -dx, axis=1)
        bl = jnp.roll(bot_l, -dx, axis=1)
        bf = jnp.roll(fg_b, -dx, axis=1)
        xs = jnp.arange(w)[None, :]
        inb = (xs + dx >= 0) & (xs + dx < w)
        ok = fg_t & bf & inb & _pred(mode, top_p, bp)
        a_all.append(jnp.where(ok, top_l, sent).reshape(-1))
        b_all.append(jnp.where(ok, bl, sent).reshape(-1))
    a = jnp.concatenate(a_all)
    b = jnp.concatenate(b_all)

    t0 = jnp.arange(n + 1, dtype=jnp.int32)

    def cond(c):
        return c[-1]

    def body(c):
        # Path-compressing the pair bases (a <- root(a)) is what
        # guarantees progress: with fixed bases a 2-jump root lookup can
        # stall on chains deeper than 2 and spin forever.
        t, a, b, _ = c
        ra = t[t[a]]
        rb = t[t[b]]
        m = jnp.minimum(ra, rb)
        t = t.at[ra].min(m).at[rb].min(m)
        return t, ra, rb, jnp.any(ra != rb)

    t, _, _, _ = jax.lax.while_loop(cond, body, (t0, a, b, jnp.bool_(True)))
    return t


def _resolve(t, v):
    """Follow t until fixpoint (paths are short after _seam_union)."""
    def cond(c):
        v, _ = c
        return jnp.any(t[v] != v)

    def body(c):
        v, it = c
        return t[v], it + 1

    v, _ = jax.lax.while_loop(cond, body, (v, jnp.int32(0)))
    return v


@functools.partial(jax.jit, static_argnames=("bgc", "mode", "bh",
                                             "round_cap", "inner_nb"))
def label_blocked(pix, bgc: int, mode: str = "equal",
                  bh: int | None = None, round_cap: int | None = None,
                  inner_nb: int = 1):
    """Exact CCL (min-flat-index fixpoint), sentinel-coded output.

    pix: (H, W) int32 value map.  Returns (H, W) int32 labels with
    background = sentinel H*W.  mode: see module docstring.

    round_cap bounds the in-VMEM flood rounds of BOTH block passes.  With
    the default (None -> _round_cap, effectively unbounded) the result is
    the exact fixpoint.  A finite cap trades convergence on adversarial
    tortuous components (percolated noise) for bounded cost — the same
    trade the reference makes with MAXPASS=10 (oclimgutil.c:229-238):
    an unconverged component is returned as several connected label
    pieces, each of geodesic radius >= the cap.  Clean structures (arcs,
    region boundaries) converge in far fewer rounds than any sane cap.
    inner_nb applies the 8-neighbor min `inner_nb` times per round before
    the scans — on turn-dominated components each extra application
    crosses one more corner per round.
    """
    h, w = pix.shape
    pix = pix.astype(jnp.int32)
    if bh is None:
        bh = _pick_bh(h, w)
    else:
        bh = _clamp_bh(bh, h, w)
    interpret = jax.default_backend() not in ("tpu",)
    lbl = _run_blocks(pix, None, bgc=bgc, mode=mode, bh=bh,
                      interpret=interpret, round_cap=round_cap,
                      inner_nb=inner_nb)
    if h <= bh:
        return lbl
    t = _seam_union(pix, lbl, bgc=bgc, mode=mode, bh=bh)
    rows = list(range(bh - 1, h - 1, bh))
    seam_rows = rows + [r + 1 for r in rows]
    sv = jnp.stack([lbl[r] for r in seam_rows])
    sv = _resolve(t, sv)
    seed = lbl
    for i, r in enumerate(seam_rows):
        seed = seed.at[r].set(sv[i])
    return _run_blocks(pix, seed, bgc=bgc, mode=mode, bh=bh,
                       interpret=interpret, round_cap=round_cap,
                       inner_nb=inner_nb)


def _label_sparse(pix, bgc: int, mode: str, comp, bh, round_cap,
                  inner_nb: int, bgval: int):
    """Two-level exact CCL with the seeded second flood replaced by a
    slot-space table resolve.

    resolve(t, block_label) IS the exact global labeling: block labels
    are block-local min roots, _seam_union's table maps every connected
    set of block roots to its global min, and _resolve follows the table
    to the fixpoint — so when a Compaction of the foreground exists, the
    final labels cost three slot-sized ops instead of a second full
    convergence flood (measured ~20 ms -> ~5 ms per instance at 720p).
    Foreground pixels beyond the compaction capacity degrade to
    background like every other slot-list overflow."""
    h, w = pix.shape
    n = h * w
    pix32 = pix.astype(jnp.int32)
    if bh is None:
        bh = _pick_bh(h, w)
    else:
        bh = _clamp_bh(bh, h, w)
    interpret = jax.default_backend() not in ("tpu",)
    lbl = _run_blocks(pix32, None, bgc=bgc, mode=mode, bh=bh,
                      interpret=interpret, round_cap=round_cap,
                      inner_nb=inner_nb)
    p_s = jnp.clip(comp.idx, 0, n - 1)
    fg_s = _fg(mode, pix32.reshape(-1)[p_s], bgc) & comp.valid()
    l_s = jnp.where(fg_s, lbl.reshape(-1)[p_s], n)
    if h > bh:
        t = _seam_union(pix32, lbl, bgc=bgc, mode=mode, bh=bh)
        # resolve only the seam VALUES (every seam-affected block root
        # appears among them), then flatten into a depth-1 map — chasing
        # t per slot costs a full slot-gather per tree level (measured
        # 2.5x the seeded flood it replaced)
        rows = list(range(bh - 1, h - 1, bh))
        sv = jnp.stack([lbl[r] for r in rows] +
                       [lbl[r + 1] for r in rows]).reshape(-1)
        rv = _resolve(t, sv)
        m = jnp.arange(n + 1, dtype=jnp.int32)
        m = m.at[sv].set(rv, mode="drop")
        l_s = m[jnp.minimum(l_s, n)]
    out = jnp.full((n + 1,), bgval, jnp.int32).at[
        jnp.where(fg_s, p_s, n)].set(l_s, mode="drop")[:n]
    return out.reshape(h, w)


def label_components_exact(pix, bgc: int, bh: int | None = None,
                           round_cap: int | None = None,
                           inner_nb: int = 1, comp=None):
    """Drop-in exact replacement for ccl.label_components (bg -> -1)."""
    if comp is not None:
        return _label_sparse(pix, bgc, "equal", comp, bh, round_cap,
                             inner_nb, -1)
    h, w = pix.shape
    lbl = label_blocked(pix, bgc, "equal", bh, round_cap, inner_nb)
    fg = pix != bgc
    return jnp.where(fg, lbl, -1).astype(jnp.int32)


def label_components_pieces(pix, bgc: int, round_cap: int,
                            bh: int | None = None, inner_nb: int = 1):
    """Single-level capped CCL: block-local piece labels, bg -> -1.

    For consumers that only aggregate over labels (the calcStrength /
    filterStrength pair, oclimgutil.cl:641-657) exact global components
    are unnecessary: an unconverged or seam-straddling component is
    returned as several connected pieces, and any piece of geodesic
    radius >= round_cap has far more than threshold strength, so the
    filtered OUTPUT matches the converged one on structured content
    (validated against the exact labeling in tests/test_pallas_ccl.py).
    This skips the seam union and the second seeded block pass — ~2x
    over the capped two-level, ~10x over full convergence on dense noise.

    Deviation (strictly conservative — never keeps what the converged
    filter kills): a component that clears the strength threshold as a
    whole but leaves a sub-threshold sliver on one side of a block seam
    (or beyond the round cap) loses that sliver.  The reference's own
    MAXPASS=10 labeling (oclimgutil.c:229-238) makes the same class of
    trade on unconverged components.
    """
    h, w = pix.shape
    if bh is None:
        bh = _pick_bh(h, w)
    else:
        bh = _clamp_bh(bh, h, w)
    interpret = jax.default_backend() not in ("tpu",)
    lbl = _run_blocks(pix.astype(jnp.int32), None, bgc=bgc, mode="equal",
                      bh=bh, interpret=interpret, round_cap=round_cap,
                      inner_nb=inner_nb)
    fg = pix != bgc
    return jnp.where(fg, lbl, -1).astype(jnp.int32)


def label_arcs_exact(number, bh: int | None = None,
                     round_cap: int | None = None, inner_nb: int = 1,
                     comp=None):
    """Drop-in exact replacement for ccl.label_arcs (bg -> 0)."""
    if comp is not None:
        return _label_sparse(number, 0, "arc", comp, bh, round_cap,
                             inner_nb, 0)
    h, w = number.shape
    lbl = label_blocked(number.astype(jnp.int32), 0, "arc", bh,
                        round_cap, inner_nb)
    fg = number > 0
    return jnp.where(fg, lbl, 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Links mode: exact 4-connected CCL over explicit pair-link masks.  Serves
# label_merge (labelMergeMain, oclrect.cl:300-334), whose adjacency is an
# arbitrary precomputed relation (color equality / merge masks / edge
# blocking collapsed into symmetric H/V links by regions._merge_pairs).
# Every pixel is foreground (the reference labels the whole frame).
# ---------------------------------------------------------------------------


def _links_block_kernel(lh_ref, lv_ref, seed_ref, out_ref, *,
                        h: int, w: int, bh: int, seeded: bool):
    blk = pl.program_id(0)
    ly = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
    yy = ly + blk * bh
    idx = yy * w + xx
    sent = jnp.int32(h * w)
    valid = yy < h

    def sh(arr, dy: int, dx: int, fill):
        v = arr
        if dy:
            v = jnp.roll(v, -dy, 0)
        if dx:
            v = jnp.roll(v, -dx, 1)
        ok = None
        if dy:
            ok = (ly + dy >= 0) & (ly + dy < bh)
        if dx:
            okx = (xx + dx >= 0) & (xx + dx < w)
            ok = okx if ok is None else (ok & okx)
        return v if ok is None else jnp.where(ok, v, fill)

    # lh[y,x]=1 links (y,x)-(y,x+1); lv[y,x]=1 links (y,x)-(y+1,x).
    # Padded rows carry no links; intra-block vertical links must stop at
    # the block's last row (the seam link is resolved by _links_seam).
    lh = jnp.where(valid, lh_ref[:], 0)
    lv = jnp.where(valid & (ly < bh - 1), lv_ref[:], 0)

    conn_l = sh(lh, 0, -1, 0)       # linked to (y, x-1)
    conn_u = sh(lv, -1, 0, 0)       # linked to (y-1, x)

    if seeded:
        label = jnp.where(valid, seed_ref[:], sent)
    else:
        label = jnp.where(valid, idx, sent)

    def seg_scan(v, conn, axis: int, reverse: bool, length: int):
        if reverse:
            f = sh(conn, 0, 1, 0) if axis == 1 else sh(conn, 1, 0, 0)
        else:
            f = conn
        d = 1
        while d < length:
            step = d if reverse else -d
            if axis == 1:
                v_sh = sh(v, 0, step, sent)
                f_sh = sh(f, 0, step, 0)
            else:
                v_sh = sh(v, step, 0, sent)
                f_sh = sh(f, step, 0, 0)
            v = jnp.where(f != 0, jnp.minimum(v, v_sh), v)
            f = f & f_sh
            d *= 2
        return v

    def one_round(lbl):
        g = lbl
        g = jnp.minimum(g, jnp.where(conn_l != 0, sh(lbl, 0, -1, sent),
                                     sent))
        g = jnp.minimum(g, jnp.where(lh != 0, sh(lbl, 0, 1, sent), sent))
        g = jnp.minimum(g, jnp.where(conn_u != 0, sh(lbl, -1, 0, sent),
                                     sent))
        g = jnp.minimum(g, jnp.where(lv != 0, sh(lbl, 1, 0, sent), sent))
        g = seg_scan(g, conn_l, 1, False, w)
        g = seg_scan(g, conn_l, 1, True, w)
        g = seg_scan(g, conn_u, 0, False, bh)
        g = seg_scan(g, conn_u, 0, True, bh)
        return g

    cap = jnp.int32(_round_cap(bh, w))

    def cond(c):
        _, changed, it = c
        return changed & (it < cap)

    def body(c):
        lbl, _, it = c
        new = one_round(lbl)
        return new, jnp.any(new != lbl), it + 1

    label, _, _ = jax.lax.while_loop(
        cond, body, (label, jnp.bool_(True), jnp.int32(0)))
    out_ref[:] = label


def _run_links_blocks(lh, lv, seed, *, bh: int, interpret: bool):
    h, w = lh.shape
    vmem.assert_fits("ccl_merge", bh * w)   # incl. caller-supplied bh
    nb = pl.cdiv(h, bh)
    spec = pl.BlockSpec((bh, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kern = functools.partial(_links_block_kernel, h=h, w=w, bh=bh,
                             seeded=seed is not None)
    if seed is None:
        seed = lh                   # unused placeholder, same spec
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=(nb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        compiler_params=vmem.compiler_params(),
    )(lh, lv, seed)


def _links_seam_union(lv, lbl, *, bh: int):
    """Union-find over the vertical links straddling block seams."""
    h, w = lv.shape
    n = h * w
    sent = jnp.int32(n)
    rows = list(range(bh - 1, h - 1, bh))
    link = jnp.stack([lv[r] for r in rows]) != 0
    a = jnp.where(link, jnp.stack([lbl[r] for r in rows]),
                  sent).reshape(-1)
    b = jnp.where(link, jnp.stack([lbl[r + 1] for r in rows]),
                  sent).reshape(-1)
    t0 = jnp.arange(n + 1, dtype=jnp.int32)

    def cond(c):
        return c[-1]

    def body(c):
        t, a, b, _ = c
        ra = t[t[a]]
        rb = t[t[b]]
        m = jnp.minimum(ra, rb)
        t = t.at[ra].min(m).at[rb].min(m)
        return t, ra, rb, jnp.any(ra != rb)

    t, _, _, _ = jax.lax.while_loop(cond, body, (t0, a, b, jnp.bool_(True)))
    return t


@functools.partial(jax.jit, static_argnames=("bh",))
def label_links_blocked(lh, lv, bh: int | None = None):
    """Exact 4-connected CCL over link masks; every pixel is foreground.

    lh: (H, W) int32, lh[y,x] != 0 links (y,x)-(y,x+1) (last column
    ignored); lv: (H, W) int32, lv[y,x] != 0 links (y,x)-(y+1,x) (last
    row ignored).  Returns (H, W) int32 min-flat-index labels.
    """
    h, w = lh.shape
    lh = lh.astype(jnp.int32)
    lv = lv.astype(jnp.int32)
    # zero the ignored edges so kernels and seams can trust the masks
    lh = lh.at[:, w - 1].set(0)
    lv = lv.at[h - 1, :].set(0)
    if bh is None:
        bh = _pick_bh(h, w)
    else:
        bh = _clamp_bh(bh, h, w)
    interpret = jax.default_backend() not in ("tpu",)
    lbl = _run_links_blocks(lh, lv, None, bh=bh, interpret=interpret)
    if h <= bh:
        return lbl
    t = _links_seam_union(lv, lbl, bh=bh)
    rows = list(range(bh - 1, h - 1, bh))
    seam_rows = rows + [r + 1 for r in rows]
    sv = jnp.stack([lbl[r] for r in seam_rows])
    sv = _resolve(t, sv)
    seed = lbl
    for i, r in enumerate(seam_rows):
        seed = seed.at[r].set(sv[i])
    return _run_links_blocks(lh, lv, seed, bh=bh, interpret=interpret)


def label_merge_exact(packed, mask, edge_label, bh: int | None = None,
                      x0=0, w_total: int | None = None):
    """Drop-in exact replacement for regions.label_merge.

    x0/w_total (width tiles, dist/tile.py): only the LINK construction is
    border-sensitive; the Pallas flood consumes links verbatim, so the
    offset form is exactly as exact as the default."""
    from rectdetect_tpu.ops.regions import _merge_pairs
    h, w = packed.shape
    mh, mv = _merge_pairs(packed, mask, edge_label, x0, w_total)
    lh = jnp.zeros((h, w), jnp.int32).at[:, :w - 1].set(
        mh.astype(jnp.int32))
    lv = jnp.zeros((h, w), jnp.int32).at[:h - 1, :].set(
        mv.astype(jnp.int32))
    return label_links_blocked(lh, lv, bh).astype(jnp.int32)
