"""Decompose the hypotheses stage (+30 ms) and edge-labeling stage
(+18 ms) on the live platform with real pipeline inputs.

Usage: python tools/hyp_tune.py [HxW] [N]
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
    from rectdetect_tpu.config import DEFAULT_CONFIG as cfg
    from rectdetect_tpu.ops import ccl, morphology, regions, reduce_ls
    from rectdetect_tpu.ops import polyline
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from rectdetect_tpu.pipeline import rect as prect
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h, w = (int(v) for v in res.split("x"))
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    spw = max(4096, h * w // cfg.sparse_factor)
    spb = max(4096, h * w // cfg.boundary_sparse_factor)

    @jax.jit
    def prep(bgr):
        fe = edge_frontend(bgr, cfg)
        s = morphology.strings_chain(fe.edge_bin, "rect", bridge2=cfg.bridge_gap2)
        lbl = ccl.label_components_adaptive(
            s, 0, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, h * w // 8), big_cap=spw,
            round_cap=cfg.weak_ccl_round_cap, pieces_ok=True)
        st = ccl.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
        weak_lbl = ccl.filter_strength(lbl, st, cfg.strength_weak)
        weak_bin = (weak_lbl > 0).astype(jnp.int32)
        blurred = regions.blblur(fe.packed0, weak_bin, cfg.blblur_iters)
        despeck = regions.quantize_despeckle(blurred, fe.edge_thin,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels)
        strong_lbl = ccl.filter_strength(weak_lbl, st, cfg.strength_strong)
        strong_bin = (strong_lbl > 0).astype(jnp.int32)
        mask = regions.junction_merge_mask(strong_lbl)
        seg = regions.label_merge(despeck, mask, strong_lbl,
                                  cfg.labelmerge_passes,
                                  cfg.labelmerge_jumps)
        sizes = regions.label_sizes(seg)
        seg = regions.despeckle2(seg, sizes, cfg.despeckle2_thre)
        bmark = regions.mark_boundary(seg)
        boundary = ccl.label_components_adaptive(
            bmark, -1, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, h * w // 16), big_cap=spb,
            round_cap=cfg.boundary_ccl_round_cap)
        cap = cfg.ls_cap_for(w, h)
        arena, lsid, plcomp = polyline.polyline_execute(
            strong_bin, cfg.minerror_rect, cfg.size_thre_rect, cap, cfg,
            return_comp=True)
        return (fe.edge_thin, fe.edge_bin, s, lbl, st, weak_lbl, boundary,
                lsid, arena, plcomp)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    ins = []
    for f in frames:
        out = prep(f)
        ins.append(jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x)), out))

    # --- edge labeling sub-ops ------------------------------------------
    ms = jax.jit(lambda eb: morphology.strings_chain(eb, "rect"))
    t = amortized(ms, [(t_[1],) for t_ in ins], n)
    print(f"strings_chain(rect)   {t*1000:9.2f} ms", flush=True)

    pc = jax.jit(lambda s_: ccl.label_components_adaptive(
        s_, 0, cfg.ccl_passes, cfg.ccl_jumps,
        small_cap=max(4096, h * w // 8), big_cap=spw,
        round_cap=cfg.weak_ccl_round_cap, pieces_ok=True))
    t = amortized(pc, [(t_[2],) for t_ in ins], n)
    print(f"pieces CCL            {t*1000:9.2f} ms", flush=True)

    cs = jax.jit(lambda e, l: ccl.calc_strength(e, l, cfg.strength_scale))
    t = amortized(cs, [(t_[0], t_[3]) for t_ in ins], n)
    print(f"calc_strength         {t*1000:9.2f} ms", flush=True)

    fw = jax.jit(lambda l, s_: ccl.filter_strength(l, s_,
                                                   cfg.strength_weak))
    t = amortized(fw, [(t_[3], t_[4]) for t_ in ins], n)
    print(f"filter_strength       {t*1000:9.2f} ms", flush=True)

    # --- hypotheses sub-ops ---------------------------------------------
    nentry = w * h * 4 // 5
    ec = max(4096, w * h // cfg.arc_sparse_factor)

    pb = jax.jit(lambda b, l, c: reduce_ls.pair_bbox_table(
        b, l, nentry, edge_cap=ec, comp=c))
    t = amortized(pb, [(t_[6], t_[7], t_[9]) for t_ in ins], n)
    print(f"pair_bbox_table       {t*1000:9.2f} ms", flush=True)

    dn = jax.jit(lambda b: reduce_ls.densify_labels(b, bg=-1)[1])
    t = amortized(dn, [(t_[6],) for t_ in ins], n)
    print(f"densify_labels        {t*1000:9.2f} ms", flush=True)

    def roots_of(boundary, table):
        nn = h * w
        idxs = jnp.arange(nn, dtype=jnp.int32)
        flatb = boundary.reshape(-1)
        is_root = (flatb == idxs) & (flatb >= 0)
        return jnp.zeros((cfg.max_groups + 1,), jnp.int32).at[
            jnp.where(is_root, table[jnp.clip(flatb, 0, nn - 1)],
                      cfg.max_groups + 1)].set(idxs, mode="drop")
    rt = jax.jit(lambda b: roots_of(b, reduce_ls.densify_labels(b, -1)[1]))
    t = amortized(rt, [(t_[6],) for t_ in ins], n)
    print(f"densify+roots         {t*1000:9.2f} ms", flush=True)

    pm = jax.jit(lambda b, a, tab: reduce_ls.probe_membership(
        b, a, cfg.max_groups, tab, cfg.probe_n, cfg.probe_dist))
    tabs = [jax.device_put(np.asarray(dn(t_[6]))) for t_ in ins]
    t = amortized(pm, [(t_[6], t_[8], tb) for t_, tb in zip(ins, tabs)], n)
    print(f"probe_membership      {t*1000:9.2f} ms", flush=True)

    ms_in = [jax.device_put(np.asarray(pm(t_[6], t_[8], tb)))
             for t_, tb in zip(ins, tabs)]
    mk = jax.jit(lambda m: prect._members_from_matrix(
        m, cfg.max_groups, cfg.max_group_segs))
    t = amortized(mk, [(m,) for m in ms_in], n)
    print(f"members top_k         {t*1000:9.2f} ms", flush=True)

    cm = jax.jit(lambda a: reduce_ls.chain_membership(
        a, cfg.max_groups, cfg.ls_min_len_polyline))
    t = amortized(cm, [(t_[8],) for t_ in ins], n)
    print(f"chain_membership      {t*1000:9.2f} ms", flush=True)

    hyp = jax.jit(lambda a, l, b, c: prect._hypotheses(a, l, b, w, h, cfg,
                                                       comp=c))
    t = amortized(hyp, [(t_[8], t_[7], t_[6], t_[9]) for t_ in ins], n)
    print(f"hypotheses (full)     {t*1000:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
