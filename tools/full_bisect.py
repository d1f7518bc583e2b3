"""Locate where the full rect_frame program's time goes by timing jitted
PREFIXES of the pipeline (the per-stage numbers in stage_bench measure each
stage as its own program; the full program can differ by fusion, layout
conversion between Mosaic custom calls, and scheduling).

Each prefix ends in a tiny reduction so nothing is dead-code-eliminated.
Amortized single-readback protocol at high N (the relay's flat ~105 ms
readback cost divides by N).

Usage: python tools/full_bisect.py [HxW] [N] [upto]
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
    from rectdetect_tpu.geometry import pose as gpose
    from rectdetect_tpu.geometry import quad as gquad
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    upto = int(sys.argv[3]) if len(sys.argv) > 3 else 99
    h, w = (int(v) for v in res.split("x"))
    # measure what the bench measures: the calibrated plan applied
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config
    cfg = load_calibrated_config(h, w, verbose=True)
    tan = math.tan(math.radians(72) / 2)
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    for f in frames:
        f.block_until_ready()

    sp = max(4096, h * w // cfg.sparse_factor) if cfg.sparse_factor else None
    spb = (max(4096, h * w // cfg.boundary_sparse_factor)
           if cfg.sparse_factor else None)

    def upto_stage(bgr, stop: int):
        fe = edge_frontend(bgr, cfg)
        if stop == 0:
            return fe.edge_thin.sum()
        s = morphology.strings_chain(fe.edge_bin, "rect", bridge2=cfg.bridge_gap2)
        lbl = ccl.label_components_adaptive(
            s, 0, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, h * w // 8), big_cap=sp,
            round_cap=cfg.weak_ccl_round_cap, pieces_ok=True,
            bh=cfg.ccl_bh or cfg.pieces_bh or None)
        from rectdetect_tpu.ops.compact import compact_mask
        scomp = compact_mask((s != 0).reshape(-1), sp) if sp else None
        weak_lbl, strong_lbl, st = ccl.strength_filter_pair(
            fe.edge_thin, lbl, scomp, cfg.strength_weak,
            cfg.strength_strong, cfg.strength_scale)
        weak_bin = (weak_lbl > 0).astype(jnp.int32)
        if stop == 1:
            return weak_lbl.sum()
        blurred = regions.blblur(fe.packed0, weak_bin, cfg.blblur_iters)
        despeck = regions.quantize_despeckle(blurred, fe.edge_thin,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels)
        if stop == 2:
            return despeck.sum()
        strong_bin = (strong_lbl > 0).astype(jnp.int32)
        mask = regions.junction_merge_mask(strong_lbl)
        seg = regions.label_merge(despeck, mask, strong_lbl,
                                  cfg.labelmerge_passes,
                                  cfg.labelmerge_jumps,
                                  bh=cfg.ccl_bh or cfg.merge_bh or None)
        seg = regions.sizes_despeckle2(seg, cfg.despeckle2_thre,
                                       cfg.region_run_factor)
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
        if stop == 6:
            return segs.sum() + valid.sum()
        corners, ok = gquad.reduce_groups(segs, valid,
                                          cfg.hull_max_vertices)
        c2, c3, val = gpose.pose_estimate(corners, w, h, tan,
                                          cfg.cg_iters,
                                          cfg.cg_line_search_iters)
        return jnp.nan_to_num(c2).sum() + jnp.nan_to_num(val).sum()

    names = ["frontend", "+edge_labeling", "+blblur/despeckle",
             "+label_merge", "+boundary_ccl", "+polyline", "+hypotheses",
             "+reduce+pose (full)"]
    prev = 0.0
    for stop, name in enumerate(names):
        if stop > upto:
            break
        f = jax.jit(lambda b, s=stop: upto_stage(b, s))
        t = amortized(f, [(fr,) for fr in frames], n) * 1000
        print(f"{name:22s} {t:9.2f} ms  (+{t - prev:7.2f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
