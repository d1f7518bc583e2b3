"""Compare the XLA fixed-pass CCL against the Pallas two-level exact CCL
on the live platform at a given resolution (amortized single-readback
protocol — see tools/stage_bench.py).

Usage: python tools/ccl_bench.py [HxW] [N]
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
    from rectdetect_tpu.ops import ccl, morphology, pallas_ccl
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = (int(v) for v in res.split("x"))
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    fe = jax.jit(lambda f: edge_frontend(f, cfg))
    morph = jax.jit(lambda eb: morphology.stringify(
        morphology.stringify(morphology.simple_connect_rect(
            morphology.simple_junction(eb, positive_only=True)), 0), 1))
    strings = [morph(fe(f).edge_bin) for f in frames]
    dens = float(jnp.mean((strings[0] != 0).astype(jnp.float32)))
    print(f"strings density {dens:.3f}", flush=True)

    sp = max(4096, h * w // cfg.sparse_factor) if cfg.sparse_factor else None
    xla = jax.jit(lambda s: ccl.label_components(
        s, 0, cfg.ccl_passes, cfg.ccl_jumps, sparse_cap=sp,
        scan_boost=True))
    t = amortized(xla, [(s,) for s in strings], n)
    print(f"xla sparse+scan     {t*1000:9.2f} ms", flush=True)

    pal = jax.jit(lambda s: pallas_ccl.label_components_exact(s, 0))
    t = amortized(pal, [(s,) for s in strings], n)
    print(f"pallas two-level    {t*1000:9.2f} ms", flush=True)

    # agreement check on the real platform
    a = np.asarray(xla(strings[0]))
    b = np.asarray(pal(strings[0]))
    print(f"labels equal: {np.array_equal(a, b)}", flush=True)

    for bh in (64, 96, 128, 160, 256):
        try:
            palb = jax.jit(lambda s, bh=bh:
                           pallas_ccl.label_components_exact(s, 0, bh=bh))
            t = amortized(palb, [(s,) for s in strings], n)
            print(f"pallas bh={bh:<4}      {t*1000:9.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas bh={bh:<4}      FAILED {type(e).__name__}",
                  flush=True)


def boundary_mode():
    """A/B the boundary-map CCL instance: Pallas block flood vs the XLA
    sparse gather path (the boundary strip is 1-5% dense on typical
    frames — block floods pay density-independent cost there).

    Usage: python tools/ccl_bench.py boundary [HxW] [N]
    """
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from rectdetect_tpu.config import DEFAULT_CONFIG as cfg
    from rectdetect_tpu.ops import ccl, morphology, regions, pallas_ccl
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from bench import synth_frame

    res = sys.argv[2] if len(sys.argv) > 2 else "720x1280"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    h, w = (int(v) for v in res.split("x"))
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)
    spb = max(4096, h * w // cfg.boundary_sparse_factor)

    @jax.jit
    def prep(bgr):
        fe = edge_frontend(bgr, cfg)
        s = morphology.strings_chain(fe.edge_bin, "rect", bridge2=cfg.bridge_gap2)
        lbl = ccl.label_components_adaptive(
            s, 0, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, h * w // 8),
            big_cap=max(4096, h * w // cfg.sparse_factor),
            round_cap=cfg.weak_ccl_round_cap, pieces_ok=True)
        st = ccl.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
        weak_lbl = ccl.filter_strength(lbl, st, cfg.strength_weak)
        weak_bin = (weak_lbl > 0).astype(jnp.int32)
        blurred = regions.blblur(fe.packed0, weak_bin, cfg.blblur_iters)
        despeck = regions.quantize_despeckle(blurred, fe.edge_thin,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels,
                                             cfg.quantize_levels)
        strong_lbl = ccl.filter_strength(weak_lbl, st,
                                         cfg.strength_strong)
        mask = regions.junction_merge_mask(strong_lbl)
        seg = regions.label_merge(despeck, mask, strong_lbl,
                                  cfg.labelmerge_passes,
                                  cfg.labelmerge_jumps)
        seg = regions.despeckle2(seg, regions.label_sizes(seg),
                                 cfg.despeckle2_thre)
        return regions.mark_boundary(seg)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    bms = [jax.device_put(np.asarray(prep(f))) for f in frames]
    dens = float(np.mean(np.asarray(bms[0]) >= 0))
    print(f"boundary density {dens:.4f}", flush=True)

    pal = jax.jit(lambda b: pallas_ccl.label_components_exact(
        b, -1, round_cap=cfg.boundary_ccl_round_cap or None))
    t = amortized(pal, [(b,) for b in bms], n)
    print(f"pallas (round-capped)  {t*1000:9.2f} ms", flush=True)

    for fac in (8, 16, 32):
        spx = max(4096, h * w // fac)
        xla = jax.jit(lambda b, spx=spx: ccl.label_components(
            b, -1, cfg.ccl_passes, cfg.ccl_jumps, sparse_cap=spx,
            scan_boost=True, force_xla=True))
        t = amortized(xla, [(b,) for b in bms], n)
        a = np.asarray(xla(bms[0]))
        bb = np.asarray(pal(bms[0]))
        print(f"xla sparse /{fac:<3}       {t*1000:9.2f} ms  "
              f"equal={np.array_equal(a, bb)}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "boundary":
        boundary_mode()
    else:
        main()
