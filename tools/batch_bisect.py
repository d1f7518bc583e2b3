"""Decompose the batched-vs-single marginal frame cost by pipeline
prefix (round-3 verdict item 7): times jitted prefixes of the pinned
batched program at B and the same prefixes at B=1, reporting the
per-frame marginal of each stage — where vmap fails to amortize.

Usage: python tools/batch_bisect.py [HxW] [B] [N]
"""

from __future__ import annotations

import math
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
    from rectdetect_tpu.ops import ccl, morphology, polyline, regions
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from rectdetect_tpu.pipeline import rect as prect
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    h, w = (int(v) for v in res.split("x"))
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config
    cfg = load_calibrated_config(h, w, batch=True, verbose=True)
    tan = math.tan(math.radians(72) / 2)
    print(f"platform={jax.devices()[0].platform} {h}x{w} B={B} N={n}",
          flush=True)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(4)]
    batch = jnp.stack([frames[i % 4] for i in range(B)])
    spb = (max(4096, h * w // cfg.boundary_sparse_factor)
           if cfg.sparse_factor else None)

    def upto(bgr, stop: int):
        fe = edge_frontend(bgr, cfg)
        if stop == 0:
            return fe.edge_thin.sum()
        weak_lbl, strong_lbl, st, scomp = prect.weak_strong_labels(
            fe.edge_bin, fe.edge_thin, cfg)
        if strong_lbl is None:
            strong_lbl = ccl.filter_strength(weak_lbl, st,
                                             cfg.strength_strong,
                                             comp=scomp)
        if stop == 1:
            return weak_lbl.sum() + strong_lbl.sum()
        weak_bin = (weak_lbl > 0).astype(jnp.int32)
        blurred = regions.blblur(fe.packed0, weak_bin, cfg.blblur_iters,
                                 block=cfg.blblur_block,
                                 fuse=cfg.blblur_fuse)
        despeck = regions.quantize_despeckle(blurred, fe.edge_thin,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels,
                                             bh=cfg.quant_bh)
        if stop == 2:
            return despeck.sum()
        strong_bin = (strong_lbl > 0).astype(jnp.int32)
        mask = regions.junction_merge_mask(strong_lbl)
        seg = regions.label_merge(despeck, mask, strong_lbl,
                                  cfg.labelmerge_passes,
                                  cfg.labelmerge_jumps,
                                  bh=cfg.ccl_bh or cfg.merge_bh or None)
        seg = regions.sizes_despeckle2(seg, cfg.despeckle2_thre,
                                       cfg.region_run_factor,
                                       pin=cfg.pin_region_runs)
        if stop == 3:
            return seg.sum()
        bmark = regions.mark_boundary(seg)
        boundary = ccl.label_components_adaptive(
            bmark, -1, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, h * w // 16), big_cap=spb,
            round_cap=cfg.boundary_ccl_round_cap,
            force_xla=cfg.boundary_tpu_sparse,
            bh=cfg.ccl_bh or cfg.boundary_bh or None)
        if stop == 4:
            return boundary.sum()
        cap = cfg.ls_cap_for(w, h)
        arena, lsid, plcomp = polyline.polyline_execute(
            strong_bin, cfg.minerror_rect, cfg.size_thre_rect, cap, cfg,
            return_comp=True)
        if stop == 5:
            return arena.sx.sum() + lsid.sum() + boundary.sum()
        segs, valid, status = prect._hypotheses(arena, lsid, boundary,
                                                w, h, cfg, comp=plcomp)
        return segs.sum() + valid.sum()

    names = ["frontend", "+edge_labeling", "+blblur/quant",
             "+region_merge", "+boundary_ccl", "+polyline",
             "+hypotheses"]
    prev1 = prevB = 0.0
    print(f"{'stage':16s} {'B=1':>9s} {'B=' + str(B):>9s} "
          f"{'marg/frame':>11s} {'ratio':>6s}")
    for stop, name in enumerate(names):
        f1 = jax.jit(lambda x, s=stop: upto(x, s))
        fB = jax.jit(lambda x, s=stop: jax.vmap(
            lambda y: upto(y, s))(x).sum())
        t1 = amortized(f1, [(fr,) for fr in frames[:2]], n) * 1e3
        tB = amortized(fB, [(batch,)], n) * 1e3
        d1 = t1 - prev1
        dB = (tB - prevB) / B
        print(f"{name:16s} {d1:8.2f}  {(tB - prevB):8.2f}  "
              f"{dB:10.2f}  {dB / max(d1, 1e-9):5.2f}x", flush=True)
        prev1, prevB = t1, tB


if __name__ == "__main__":
    main()
