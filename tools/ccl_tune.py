"""Decompose the Pallas CCL cost on the live platform: exact two-level vs
round-capped variants on the pipeline's real weak-edge and boundary maps,
plus device-reported convergence rounds.  Amortized single-readback
protocol (tools/stage_bench.py).

Usage: python tools/ccl_tune.py [HxW] [N]
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
    from rectdetect_tpu.ops import morphology, pallas_ccl, regions, ccl
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = (int(v) for v in res.split("x"))
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    fe = jax.jit(lambda f: edge_frontend(f, cfg))
    fes = [fe(f) for f in frames]
    mk_weak = jax.jit(lambda eb: morphology.strings_chain(eb, "rect"))
    weaks = [mk_weak(f.edge_bin) for f in fes]
    dens = float(jnp.mean((weaks[0] != 0).astype(jnp.float32)))
    print(f"weak-map density {dens:.3f}", flush=True)

    bh = pallas_ccl._pick_bh(h, w)
    # device-reported rounds, uncapped
    rr = jax.jit(lambda s: pallas_ccl._run_blocks(
        s.astype(jnp.int32), None, bgc=0, mode="equal", bh=bh,
        interpret=False, want_rounds=True)[1])
    print("weak rounds/block:", np.asarray(rr(weaks[0])).ravel().tolist(),
          flush=True)

    ex = jax.jit(lambda s: pallas_ccl.label_components_exact(s, 0))
    t = amortized(ex, [(s,) for s in weaks], n)
    print(f"weak exact two-level   {t*1000:9.2f} ms", flush=True)

    for cap in (16, 32, 48, 96):
        pc = jax.jit(lambda s, c=cap: pallas_ccl.label_components_pieces(
            s, 0, round_cap=c))
        t = amortized(pc, [(s,) for s in weaks], n)
        print(f"weak pieces cap={cap:<4}  {t*1000:9.2f} ms", flush=True)

    for inner in (2, 4):
        pc = jax.jit(lambda s, k=inner: pallas_ccl.label_components_pieces(
            s, 0, round_cap=48 // k, inner_nb=k))
        t = amortized(pc, [(s,) for s in weaks], n)
        print(f"weak pieces 48/k k={inner} {t*1000:9.2f} ms", flush=True)

    # ---- boundary map ---------------------------------------------------
    def mk_bmark(fe_):
        s = morphology.strings_chain(fe_.edge_bin, "rect")
        lbl = pallas_ccl.label_components_pieces(s, 0, round_cap=48)
        st = ccl.calc_strength(fe_.edge_thin, lbl, cfg.strength_scale)
        weak_lbl = ccl.filter_strength(lbl, st, cfg.strength_weak)
        blurred = regions.blblur(fe_.packed0,
                                 (weak_lbl > 0).astype(jnp.int32),
                                 cfg.blblur_iters)
        despeck = regions.quantize_despeckle(blurred, fe_.edge_thin,
                                             24, 24, 24)
        strong_lbl = ccl.filter_strength(weak_lbl, st, cfg.strength_strong)
        jn2 = morphology.simple_junction(strong_lbl, positive_only=True)
        mask = regions.merge_mask(jn2)
        seg = regions.label_merge(despeck, mask, strong_lbl,
                                  cfg.labelmerge_passes,
                                  cfg.labelmerge_jumps)
        seg = regions.despeckle2(seg, regions.label_sizes(seg),
                                 cfg.despeckle2_thre)
        return regions.mark_boundary(seg)

    bmarks = [jax.jit(mk_bmark)(f) for f in fes]
    dens = float(jnp.mean((bmarks[0] != -1).astype(jnp.float32)))
    print(f"boundary density {dens:.3f}", flush=True)
    rrb = jax.jit(lambda s: pallas_ccl._run_blocks(
        s.astype(jnp.int32), None, bgc=-1, mode="equal", bh=bh,
        interpret=False, want_rounds=True)[1])
    print("boundary rounds/block:",
          np.asarray(rrb(bmarks[0])).ravel().tolist(), flush=True)

    exb = jax.jit(lambda s: pallas_ccl.label_components_exact(s, -1))
    t = amortized(exb, [(s,) for s in bmarks], n)
    print(f"boundary exact         {t*1000:9.2f} ms", flush=True)
    for cap in (64, 128):
        cb = jax.jit(lambda s, c=cap: pallas_ccl.label_components_exact(
            s, -1, round_cap=c))
        t = amortized(cb, [(s,) for s in bmarks], n)
        print(f"boundary capped {cap:<4}   {t*1000:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
