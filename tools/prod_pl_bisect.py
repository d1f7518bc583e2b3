"""Prefix-bisect the PRODUCTION polyline tail (_polyline_tail_sparse with
the calibrated plan's runtime switches exactly as rect_geometry_tail runs
them) — pl_bisect.py measures a simplified variant without the prefilter
or the small-arc branch and so misranks the production stage costs.

Stage stops mirror ops/polyline._polyline_tail_sparse (round-4 comp1-
space structure: grouping + arc compaction run in the walk's own slot
space).

Usage: python tools/prod_pl_bisect.py [HxW] [N]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def amortized(fn, args_list, n):
    import jax
    r = fn(*args_list[0])
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(*args_list[i % len(args_list)])
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from rectdetect_tpu.config import DEFAULT_CONFIG
    from rectdetect_tpu.ops import ccl, morphology
    from rectdetect_tpu.ops import polyline as P
    from rectdetect_tpu.ops.chain import arc_chain_sparse
    from rectdetect_tpu.ops.compact import compact_mask, compact_subset
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h, w = (int(v) for v in res.split("x"))
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config
    cfg = load_calibrated_config(h, w, cfg=DEFAULT_CONFIG, verbose=True)
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    spw = max(4096, h * w // cfg.sparse_factor) if cfg.sparse_factor else None

    @jax.jit
    def front(bgr):
        fe = edge_frontend(bgr, cfg)
        s = morphology.strings_chain(fe.edge_bin, "rect", bridge2=cfg.bridge_gap2)
        lbl = ccl.label_components_adaptive(
            s, 0, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, h * w // 8), big_cap=spw,
            round_cap=cfg.weak_ccl_round_cap, pieces_ok=True)
        st = ccl.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
        weak_lbl = ccl.filter_strength(lbl, st, cfg.strength_weak)
        strong_lbl = ccl.filter_strength(weak_lbl, st, cfg.strength_strong)
        return (strong_lbl > 0).astype(jnp.int32)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    ebs = [jax.device_put(np.asarray(front(f))) for f in frames]
    cap = cfg.ls_cap_for(w, h)
    nimg = h * w
    sp = max(4096, nimg // cfg.strings_sparse_factor)
    sp_small = max(4096, nimg // cfg.strings_small_factor)
    minerror, size_thre = cfg.minerror_rect, cfg.size_thre_rect
    sp_arc = max(4096, nimg // cfg.arc_sparse_factor)
    sp_arc_small = (min(sp_arc, max(1024, nimg // cfg.arc_small_factor),
                        cap) if cfg.arc_small_factor else 0)

    # mirrors _polyline_tail_sparse body with stop points; runtime conds
    # kept exactly as production traces them
    def tail(strings, spx, stop: int):
        comp0 = compact_mask((strings != 0).reshape(-1), spx)
        if stop == 1:
            return comp0.idx.sum()
        S = comp0.cap
        cyc_cap = max(1024, nimg // cfg.cycle_sparse_factor)

        def _walk_at(comp_w):
            Sw = comp_w.cap
            tail_cap = (max(4096, 2 * Sw // cfg.walk_tail_factor)
                        if cfg.walk_tail_factor else 0)
            tail_stages = None
            if tail_cap and cfg.walk_tail_factor2:
                cap2 = max(2048, 2 * Sw // cfg.walk_tail_factor2)
                if cap2 < tail_cap:
                    tail_stages = ((cfg.walk_tail_rounds2, tail_cap),
                                   (0, cap2))
            return arc_chain_sparse(
                strings, comp_w, cfg.number_doublings, cyc_cap, None,
                tail_switch_rounds=cfg.walk_tail_switch, tail_cap=tail_cap,
                tail_stages=tail_stages, tail_pin=cfg.pin_walk_tail,
                cyc_pin=cfg.pin_cycle_walk)

        def _arc_group(walk_out, comp_w, stop2: int):
            number_w, _, live_w, _, chainlen_w, arcmin_w = walk_out
            if stop2 == 3:
                z = jnp.zeros((sp_arc,), jnp.int32)
                return (z, z, compact_subset(comp_w, live_w & False,
                                             sp_arc),
                        number_w.sum() + chainlen_w.sum())
            Sw = comp_w.cap
            p_w = jnp.clip(comp_w.idx, 0, nimg - 1)
            fgnum = live_w & (number_w > 0)
            keep = fgnum & (chainlen_w > size_thre)
            root_slot = comp_w.slot_of[jnp.clip(arcmin_w, 0, nimg)]
            keep = keep & (root_slot < Sw)
            is_root = keep & (p_w == arcmin_w)
            rank = jnp.cumsum(is_root.astype(jnp.int32))
            dense_w = jnp.where(
                keep, rank[jnp.clip(root_slot, 0, Sw - 1)], 0
            ).astype(jnp.int32)
            n_arc = jnp.sum((dense_w > 0).astype(jnp.int32))
            comp_arc = compact_subset(comp_w, dense_w > 0, sp_arc)
            slot_a = comp_w.slot_of[jnp.clip(comp_arc.idx, 0, nimg)]
            sa = jnp.clip(slot_a, 0, Sw - 1)
            dn = jnp.stack([dense_w, number_w], axis=1)[sa]
            a_ok = comp_arc.valid()
            dense_a = jnp.where(a_ok, dn[:, 0], 0)
            number_a = jnp.where(a_ok, dn[:, 1], 0)
            return dense_a, number_a, comp_arc, n_arc

        S1 = (max(4096, nimg // cfg.walk_prefilter_factor)
              if cfg.walk_prefilter_factor else 0)
        keep_s = P._small_component_kill(strings, comp0, size_thre, cfg)
        if stop == 2:
            return keep_s.sum()
        rank1 = jnp.cumsum(keep_s.astype(jnp.int32)) - 1
        n_surv = jnp.where(S > 0, rank1[-1] + 1, 0)

        def filtered(_):
            comp1 = compact_subset(comp0, keep_s, S1)
            return _arc_group(_walk_at(comp1), comp1, stop)

        def full(_):
            return _arc_group(_walk_at(comp0), comp0, stop)

        out = jax.lax.cond(n_surv <= S1, filtered, full, None)
        dense_a, number_a, comp_arc, n_arc = out
        if stop <= 4:
            return (dense_a.sum() + number_a.sum() +
                    (n_arc if stop == 4 else n_arc))

        def _mkpl_at(comp, dense_a2, number_a2, arena_cap: int,
                     stop2: int):
            tgt_a = jnp.where(comp.valid(),
                              jnp.clip(comp.idx, 0, nimg - 1), nimg)
            dense = jnp.zeros((nimg + 1,), jnp.int32).at[tgt_a].set(
                dense_a2, mode="drop")[:nimg].reshape(h, w)
            number = jnp.zeros((nimg + 1,), jnp.int32).at[tgt_a].set(
                number_a2, mode="drop")[:nimg].reshape(h, w)
            if stop2 == 5:
                return dense.sum() + number.sum()
            arena = P.mkpl_init(dense, number, arena_cap, comp)
            if stop2 == 6:
                return arena.sx.sum()
            if (cfg.mkpl_pallas and comp.cap % 128 == 0
                    and comp.cap <= 16384 and arena_cap >= comp.cap
                    and jax.default_backend() == "tpu"):
                from rectdetect_tpu.ops.pallas_mkpl import \
                    mkpl_subdivide_pallas
                arena, lsid = mkpl_subdivide_pallas(
                    arena, dense_a2, number_a2, comp, h, w, minerror,
                    cfg.mkpl_iters)
            else:
                arena, lsid = P.mkpl_subdivide(arena, dense, number,
                                               minerror,
                                               cfg.mkpl_iters, comp)
            if stop2 == 7:
                return arena.sx.sum() + lsid.sum()
            arena = P.refine(arena, lsid, comp)
            return arena.sx.sum() + lsid.sum()

        from rectdetect_tpu.ops.compact import Compaction
        if not sp_arc_small or sp_arc_small >= sp_arc:
            return _mkpl_at(comp_arc, dense_a, number_a, cap, stop)

        def small(_):
            comp_s = Compaction(
                idx=comp_arc.idx[:sp_arc_small],
                slot_of=jnp.minimum(comp_arc.slot_of,
                                    sp_arc_small).astype(jnp.int32),
                n=jnp.minimum(comp_arc.n, sp_arc_small))
            return _mkpl_at(comp_s, dense_a[:sp_arc_small],
                            number_a[:sp_arc_small], sp_arc_small, stop)

        def big(_):
            return _mkpl_at(comp_arc, dense_a, number_a, cap, stop)

        return jax.lax.cond(n_arc < sp_arc_small, small, big, None)

    def upto(eb, stop: int):
        strings = morphology.strings_chain(eb, "poly_branch",
                                           bridge2=cfg.bridge_gap2,
                                           bh=cfg.morph_bh)
        if stop == 0:
            return strings.sum()
        fg_count = jnp.sum((strings != 0).astype(jnp.int32))
        if sp_small < sp:
            return jax.lax.cond(fg_count <= sp_small,
                                lambda s: tail(s, sp_small, stop),
                                lambda s: tail(s, sp, stop), strings)
        return tail(strings, sp, stop)

    names = ["strings", "+compact0", "+small_kill", "+walk",
             "+grouping", "+images", "+mkpl_init", "+mkpl_subdivide",
             "+refine"]
    prev = 0.0
    for stop, name in enumerate(names):
        f = jax.jit(lambda e, s=stop: upto(e, s))
        t = amortized(f, [(e,) for e in ebs], n) * 1000
        print(f"{name:18s} {t:9.2f} ms  (+{t - prev:7.2f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
