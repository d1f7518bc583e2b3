"""Prefix-bisect a SIMPLIFIED polyline tail (no walk prefilter, no
small-arc branch) — useful for isolating the raw walk/mkpl costs from
the capacity machinery.  For the PRODUCTION path's stage ranking use
tools/prod_pl_bisect.py, which mirrors _polyline_tail_sparse's runtime
switches exactly.

Usage: python tools/pl_bisect.py [HxW] [N]
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
    from rectdetect_tpu.ops import ccl, morphology
    from rectdetect_tpu.ops import polyline as P
    from rectdetect_tpu.ops.chain import arc_chain_sparse
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h, w = (int(v) for v in res.split("x"))
    # measure with the same calibrated capacities the bench runs under
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config
    cfg = load_calibrated_config(h, w, cfg=cfg, verbose=True)
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    sp = (max(4096, h * w // cfg.strings_sparse_factor)
          if cfg.sparse_factor else None)
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

    def upto(eb, stop: int):
        from rectdetect_tpu.ops.compact import compact_mask, compact_subset
        strings = morphology.strings_chain(eb, "poly_branch")
        comp0 = compact_mask((strings != 0).reshape(-1), sp)
        if stop == 0:
            return strings.sum() + comp0.n
        nimg = h * w
        S = comp0.cap
        p_s = jnp.clip(comp0.idx, 0, nimg - 1)
        cyc_cap = max(1024, nimg // cfg.cycle_sparse_factor)
        tail_cap = (max(4096, 2 * S // cfg.walk_tail_factor)
                    if cfg.walk_tail_factor else 0)
        number_s, head_s, live, _, chainlen_s, arcmin_s = arc_chain_sparse(
            strings, comp0, cfg.number_doublings, cyc_cap,
            tail_switch_rounds=cfg.walk_tail_switch, tail_cap=tail_cap)
        if stop == 1:
            return number_s.sum() + head_s.sum()
        # mirrors ops/polyline._polyline_tail_sparse (elementwise stats)
        fgnum = live & (number_s > 0)
        keep = fgnum & (chainlen_s > cfg.size_thre_rect)
        root_slot = comp0.slot_of[jnp.clip(arcmin_s, 0, nimg)]
        keep = keep & (root_slot < S)
        is_root = keep & (p_s == arcmin_s)
        rank = jnp.cumsum(is_root.astype(jnp.int32))
        dense_s = jnp.where(
            keep, rank[jnp.clip(root_slot, 0, S - 1)], 0).astype(jnp.int32)
        if stop == 2:
            return dense_s.sum()
        sp_arc = max(4096, nimg // cfg.arc_sparse_factor)
        comp = compact_subset(comp0, dense_s > 0, sp_arc)
        slot_a = comp0.slot_of[jnp.clip(comp.idx, 0, nimg)]
        sa = jnp.clip(slot_a, 0, S - 1)
        tgt_a = jnp.where(comp.valid(), jnp.clip(comp.idx, 0, nimg - 1),
                          nimg)
        dense = jnp.zeros((nimg + 1,), jnp.int32).at[tgt_a].set(
            dense_s[sa], mode="drop")[:nimg].reshape(h, w)
        number = jnp.zeros((nimg + 1,), jnp.int32).at[tgt_a].set(
            number_s[sa], mode="drop")[:nimg].reshape(h, w)
        if stop == 3:
            return dense.sum() + number.sum()
        arena = P.mkpl_init(dense, number, cap, comp)
        if stop == 4:
            return arena.sx.sum()
        arena, lsid = P.mkpl_subdivide(arena, dense, number,
                                       cfg.minerror_rect, cfg.mkpl_iters,
                                       comp)
        if stop == 5:
            return arena.sx.sum() + lsid.sum()
        arena = P.refine(arena, lsid, comp)
        return arena.sx.sum() + lsid.sum()

    names = ["strings", "+arc_chain", "+group/relabel", "+images",
             "+mkpl_init", "+mkpl_subdivide", "+refine (full)"]
    prev = 0.0
    for stop, name in enumerate(names):
        f = jax.jit(lambda e, s=stop: upto(e, s))
        t = amortized(f, [(e,) for e in ebs], n) * 1000
        print(f"{name:18s} {t:9.2f} ms  (+{t - prev:7.2f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
