"""Sweep the arc-walk staging knobs (tail switch round, tail caps,
prefilter capacity) on the live platform under the calibrated plan's
densities — the round-3 winners predate the walk prefilter, so the
staging deserves a re-sweep at the smaller survivor slot count.

Usage: python tools/walk_tune.py [HxW] [N]
"""

from __future__ import annotations

import dataclasses
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
    from rectdetect_tpu.config import DEFAULT_CONFIG
    from rectdetect_tpu.ops import ccl, morphology
    from rectdetect_tpu.ops import polyline as P
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h, w = (int(v) for v in res.split("x"))
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config
    cfg0 = load_calibrated_config(h, w, cfg=DEFAULT_CONFIG, verbose=True)
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}",
          flush=True)

    spw = max(4096, h * w // cfg0.sparse_factor)

    @jax.jit
    def front(bgr):
        fe = edge_frontend(bgr, cfg0)
        s = morphology.strings_chain(fe.edge_bin, "rect",
                                     bridge2=cfg0.bridge_gap2)
        lbl = ccl.label_components_adaptive(
            s, 0, cfg0.ccl_passes, cfg0.ccl_jumps,
            small_cap=max(4096, h * w // 8), big_cap=spw,
            round_cap=cfg0.weak_ccl_round_cap, pieces_ok=True)
        st = ccl.calc_strength(fe.edge_thin, lbl, cfg0.strength_scale)
        weak_lbl = ccl.filter_strength(lbl, st, cfg0.strength_weak)
        strong_lbl = ccl.filter_strength(weak_lbl, st,
                                         cfg0.strength_strong)
        return (strong_lbl > 0).astype(jnp.int32)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    ebs = [jax.device_put(np.asarray(front(f))) for f in frames]
    cap = cfg0.ls_cap_for(w, h)

    def timed(cfg):
        def run(eb):
            arena, lsid = P.polyline_execute(eb, cfg.minerror_rect,
                                             cfg.size_thre_rect, cap, cfg)
            return arena.sx.sum() + lsid.sum()
        f = jax.jit(run)
        return amortized(f, [(e,) for e in ebs], n) * 1e3

    base = timed(cfg0)
    print(f"baseline (sw={cfg0.walk_tail_switch} f={cfg0.walk_tail_factor}"
          f" r2={cfg0.walk_tail_rounds2} f2={cfg0.walk_tail_factor2}"
          f" pf={cfg0.walk_prefilter_factor}): {base:.2f} ms", flush=True)

    if "--pf-only" in sys.argv:
        # large resolutions: the staging winners transfer; sweep only
        # the prefilter capacity (the expensive compile grid is skipped)
        best = (cfg0.walk_tail_switch, cfg0.walk_tail_factor)
        results = {best: base}
    else:
      results = {}
      for sw in (1, 2, 3, 4):
        for fac in (2, 4, 8):
            cfg = dataclasses.replace(cfg0, walk_tail_switch=sw,
                                      walk_tail_factor=fac)
            t = timed(cfg)
            results[(sw, fac)] = t
            print(f"sw={sw} f={fac}: {t:.2f} ms", flush=True)
    best = min(results, key=results.get)
    print(f"best staging: sw={best[0]} f={best[1]} "
          f"{results[best]:.2f} ms", flush=True)

    pf_res = {}
    for pf in (48, 64, 96, 128):
        cfg = dataclasses.replace(cfg0, walk_tail_switch=best[0],
                                  walk_tail_factor=best[1],
                                  walk_prefilter_factor=pf)
        t = timed(cfg)
        pf_res[pf] = t
        print(f"pf={pf}: {t:.2f} ms", flush=True)
    best_pf = min(pf_res, key=pf_res.get)
    print(f"best pf={best_pf} {pf_res[best_pf]:.2f} ms", flush=True)

    if "--save" in sys.argv:
        from rectdetect_tpu.runtime import native
        from rectdetect_tpu.runtime.calibrate import PLAN_PATH, _key
        dev = jax.devices()[0].device_kind
        key = _key(dev, h, w)
        entries = native.plan_load(PLAN_PATH, key)
        entries["walk_prefilter_factor"] = str(best_pf)
        native.plan_save(PLAN_PATH, key, entries)
        print(f"saved walk_prefilter_factor={best_pf} to [{key}]",
              flush=True)


if __name__ == "__main__":
    main()
