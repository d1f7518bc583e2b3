"""Why does the region-merge block cost ~420 ms in the full program when
its ops measure ~60 ms standalone?  Time successively larger COMBINED
programs over the same real inputs to find the composition that blows up.

Usage: python tools/lm_inprog.py [HxW] [N]
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
    from rectdetect_tpu.ops import ccl, morphology, regions
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h, w = (int(v) for v in res.split("x"))
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    sp = max(4096, h * w // cfg.sparse_factor) if cfg.sparse_factor else None

    @jax.jit
    def prep(bgr):
        fe = edge_frontend(bgr, cfg)
        s = morphology.strings_chain(fe.edge_bin, "rect", bridge2=cfg.bridge_gap2)
        lbl = ccl.label_components_adaptive(
            s, 0, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, h * w // 8), big_cap=sp,
            round_cap=cfg.weak_ccl_round_cap, pieces_ok=True)
        st = ccl.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
        weak_lbl = ccl.filter_strength(lbl, st, cfg.strength_weak)
        weak_bin = (weak_lbl > 0).astype(jnp.int32)
        blurred = regions.blblur(fe.packed0, weak_bin, cfg.blblur_iters)
        despeck = regions.quantize_despeckle(blurred, fe.edge_thin,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels)
        return despeck, weak_lbl, st

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    ins = [tuple(jax.device_put(np.asarray(x)) for x in prep(f))
           for f in frames]

    def tail(despeck, weak_lbl, st, stop):
        strong_lbl = ccl.filter_strength(weak_lbl, st, cfg.strength_strong)
        mask = regions.junction_merge_mask(strong_lbl)
        if stop == 0:
            return mask.sum() + strong_lbl.sum()
        seg = regions.label_merge(despeck, mask, strong_lbl,
                                  cfg.labelmerge_passes,
                                  cfg.labelmerge_jumps)
        if stop == 1:
            return seg.sum()
        sizes = regions.label_sizes(seg)
        if stop == 2:
            return sizes.sum()
        seg = regions.despeckle2(seg, sizes, cfg.despeckle2_thre)
        return seg.sum()

    names = ["filter+fused_mask", "+label_merge", "+label_sizes",
             "+despeckle2"]
    prev = 0.0
    for stop, name in enumerate(names):
        f = jax.jit(lambda d, wl, st_, s_=stop: tail(d, wl, st_, s_))
        t = amortized(f, ins, n) * 1000
        print(f"{name:18s} {t:9.2f} ms  (+{t - prev:7.2f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
