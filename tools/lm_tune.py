"""Compare label_merge formulations on the live platform with REAL pipeline
inputs (the stage_bench line used a zeros mask, which hid the cost: the
full-program bisect showed the region-merge stage at ~475 ms of the 720p
frame — the Pallas exact links CCL floods a 100%-dense region map).

Variants:
  * exact Pallas links CCL (current TPU dispatch)
  * XLA alternating segmented-min scans, fixed rounds (the CPU fallback;
    bounded reach like the reference's 8 passes x 8 jumps)

Usage: python tools/lm_tune.py [HxW] [N]
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
    from rectdetect_tpu.ops import pallas_ccl
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
        return despeck, mask, strong_lbl

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    ins = [tuple(np.asarray(x) for x in prep(f)) for f in frames]
    ins = [tuple(jax.device_put(x) for x in t) for t in ins]

    exact = jax.jit(lambda p, m, e: pallas_ccl.label_merge_exact(p, m, e))
    t = amortized(exact, ins, max(2, n // 4))
    print(f"exact Pallas links    {t*1000:9.2f} ms", flush=True)

    def scans(p, m, e, rounds):
        mh, mv = regions._merge_pairs(p, m, e)
        label = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)

        def one(_, lab):
            lab = regions._segmented_min_1d(lab, mh)
            lab = regions._segmented_min_1d(lab.T, mv.T).T
            return lab
        return jax.lax.fori_loop(0, rounds, one, label)

    for rounds in (8, 12, 16):
        f = jax.jit(lambda p, m, e, r=rounds: scans(p, m, e, r))
        t = amortized(f, ins, n)
        print(f"XLA scans rounds={rounds:2d}  {t*1000:9.2f} ms", flush=True)

    # agreement census: scans-vs-exact label partition difference
    la = np.asarray(exact(*ins[0]))
    for rounds in (12, 16):
        f = jax.jit(lambda p, m, e, r=rounds: scans(p, m, e, r))
        lb = np.asarray(f(*ins[0]))
        # compare as partitions: fraction of pixels whose label ROOT maps
        # 1:1 between the two labelings
        mismatch = 0
        ra = la.reshape(-1)
        rb = lb.reshape(-1)
        import collections
        amap = {}
        for i in range(0, ra.size, 7):     # sampled
            key = ra[i]
            if key in amap:
                if amap[key] != rb[i]:
                    mismatch += 1
            else:
                amap[key] = rb[i]
        print(f"rounds={rounds}: sampled root mismatches {mismatch}",
              flush=True)


if __name__ == "__main__":
    main()
