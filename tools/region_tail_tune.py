"""Decompose the region-merge stage tail (strong filter, merge_mask,
label_merge, label_sizes, despeckle2) on the live platform — the
full-program bisect put this block at ~476 ms while label_merge alone
standalone is ~33 ms; the suspects are the random-access gathers/scatters
over the 921600-entry size table.

Usage: python tools/region_tail_tune.py [HxW] [N]
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
        strong_lbl = ccl.filter_strength(weak_lbl, st, cfg.strength_strong)
        jn2 = morphology.simple_junction(strong_lbl, positive_only=True)
        mask = regions.merge_mask(jn2)
        seg = regions.label_merge(despeck, mask, strong_lbl,
                                  cfg.labelmerge_passes,
                                  cfg.labelmerge_jumps)
        return despeck, mask, strong_lbl, seg, weak_lbl, st, fe.edge_thin

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    ins = [tuple(jax.device_put(np.asarray(x)) for x in prep(f))
           for f in frames]

    fs = jax.jit(lambda wl, st: ccl.filter_strength(wl, st,
                                                    cfg.strength_strong))
    t = amortized(fs, [(t_[4], t_[5]) for t_ in ins], n)
    print(f"filter_strength(strong) {t*1000:9.2f} ms", flush=True)

    mm = jax.jit(lambda sl: regions.merge_mask(
        morphology.simple_junction(sl, positive_only=True)))
    t = amortized(mm, [(t_[2],) for t_ in ins], n)
    print(f"junction+merge_mask     {t*1000:9.2f} ms", flush=True)

    ls = jax.jit(regions.label_sizes)
    t = amortized(ls, [(t_[3],) for t_ in ins], n)
    print(f"label_sizes             {t*1000:9.2f} ms", flush=True)

    sizes = [jax.device_put(np.asarray(ls(t_[3]))) for t_ in ins]

    d2 = jax.jit(lambda s_, z: regions.despeckle2(s_, z,
                                                  cfg.despeckle2_thre))
    t = amortized(d2, [(t_[3], z) for t_, z in zip(ins, sizes)], n)
    print(f"despeckle2              {t*1000:9.2f} ms", flush=True)

    mb = jax.jit(regions.mark_boundary)
    t = amortized(mb, [(t_[3],) for t_ in ins], n)
    print(f"mark_boundary           {t*1000:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
