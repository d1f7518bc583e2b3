"""Fine-grained prefix bisect INSIDE the rect-tail stages (full_bisect's
stage granularity is too coarse to rank the slot/table ops).  Same
amortized single-readback protocol.

Usage: python tools/tail_bisect.py [HxW] [N]
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
    from rectdetect_tpu.ops import reduce_ls
    from rectdetect_tpu.ops.compact import compact_mask
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from rectdetect_tpu.pipeline import rect as prect
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h, w = (int(v) for v in res.split("x"))
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config
    cfg = load_calibrated_config(h, w, verbose=True)
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    for f in frames:
        f.block_until_ready()

    sp = max(4096, h * w // cfg.sparse_factor) if cfg.sparse_factor else None
    spb = (max(4096, h * w // cfg.boundary_sparse_factor)
           if cfg.sparse_factor else None)

    def upto(bgr, stop: int):
        fe = edge_frontend(bgr, cfg)
        if stop <= 2:
            # sub-steps of the shared block, mirrored for ranking only
            s = morphology.strings_chain(fe.edge_bin, "rect",
                                         bridge2=cfg.bridge_gap2,
                                         bh=cfg.morph_bh)
            if stop == 0:
                return s.sum()
            lbl = ccl.label_components_adaptive(
                s, 0, cfg.ccl_passes, cfg.ccl_jumps,
                small_cap=max(4096, h * w // 8), big_cap=sp,
                round_cap=cfg.weak_ccl_round_cap, pieces_ok=True,
                bh=cfg.ccl_bh or cfg.pieces_bh or None)
            if stop == 1:
                return lbl.sum()
            scomp0 = compact_mask((s != 0).reshape(-1), sp)
            return lbl.sum() + scomp0.idx.sum()
        # the production block itself (incl. the rect-strings switch)
        weak_lbl, strong_lbl, st, scomp = prect.weak_strong_labels(
            fe.edge_bin, fe.edge_thin, cfg)
        if strong_lbl is None:
            strong_lbl = ccl.filter_strength(weak_lbl, st,
                                             cfg.strength_strong,
                                             comp=scomp)
        if stop == 3:
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
        if stop == 4:
            return despeck.sum()
        strong_bin = (strong_lbl > 0).astype(jnp.int32)
        mask = regions.junction_merge_mask(strong_lbl)
        if stop == 5:
            return mask.sum() + despeck.sum()
        seg = regions.label_merge(despeck, mask, strong_lbl,
                                  cfg.labelmerge_passes,
                                  cfg.labelmerge_jumps,
                                  bh=cfg.ccl_bh or cfg.merge_bh or None)
        if stop == 6:
            return seg.sum()
        seg = regions.sizes_despeckle2(seg, cfg.despeckle2_thre,
                                       cfg.region_run_factor,
                                       pin=cfg.pin_region_runs)
        if stop == 7:
            return seg.sum()
        bmark = regions.mark_boundary(seg)
        boundary = ccl.label_components_adaptive(
            bmark, -1, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, h * w // 16), big_cap=spb,
            round_cap=cfg.boundary_ccl_round_cap,
            force_xla=cfg.boundary_tpu_sparse,
            bh=cfg.ccl_bh or cfg.boundary_bh or None)
        if stop == 8:
            return boundary.sum()
        cap = cfg.ls_cap_for(w, h)
        arena, lsid, plcomp = polyline.polyline_execute(
            strong_bin, cfg.minerror_rect, cfg.size_thre_rect, cap, cfg,
            return_comp=True)
        if stop == 9:
            return arena.sx.sum() + lsid.sum() + boundary.sum()
        # ---- inside _hypotheses ----
        gmax = cfg.max_groups
        nentry = w * h * 4 // 5
        table = reduce_ls.pair_bbox_table(
            boundary, lsid, nentry,
            edge_cap=max(4096, w * h // cfg.arc_sparse_factor),
            comp=plcomp, bids_bh=cfg.bids_bh)
        if stop == 10:
            return table.owner_lsid.sum() + arena.sx.sum()
        _, flat2dense, _, rank = reduce_ls.densify_labels(boundary, bg=-1)
        if stop == 11:
            return table.owner_lsid.sum() + flat2dense.sum() + \
                arena.sx.sum()
        ids_a, mv_a, counts = reduce_ls.probe_members(
            boundary, arena, gmax, flat2dense, cfg.max_group_segs,
            cfg.probe_n, cfg.probe_dist)
        if stop == 12:
            return (ids_a.sum() + counts.sum() +
                    table.owner_lsid.sum() + arena.sx.sum())
        segs, valid, status = prect._hypotheses(arena, lsid, boundary,
                                                w, h, cfg, comp=plcomp)
        return segs.sum() + valid.sum()

    names = ["strings_chain", "+pieces_ccl", "+compact", "+strength_pair",
             "+blblur/quant/despeckle", "+merge_mask", "+label_merge",
             "+sizes_despeckle2", "+boundary_ccl", "+polyline",
             "+pair_bbox_table", "+densify", "+probe_members",
             "+rest_of_hypotheses"]
    prev = 0.0
    for stop, name in enumerate(names):
        f = jax.jit(lambda b, s=stop: upto(b, s))
        t = amortized(f, [(fr,) for fr in frames], n) * 1e3
        print(f"{name:26s} {t:8.2f} ms  (+{t - prev:8.2f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
