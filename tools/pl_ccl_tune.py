"""Cost split of the two-level Pallas CCL on the polyline's real inputs:
unseeded block pass vs seam machinery vs the seeded second pass — decides
whether a slot-space table-resolve should replace the second flood.

Usage: python tools/pl_ccl_tune.py [HxW] [N]
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
    from rectdetect_tpu.ops.chain import arc_number, break_loops, count_ends
    from rectdetect_tpu.ops.compact import compact_mask
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h, w = (int(v) for v in res.split("x"))
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    spw = max(4096, h * w // cfg.sparse_factor)
    sp = max(4096, h * w // cfg.strings_sparse_factor)

    @jax.jit
    def prep(bgr):
        fe = edge_frontend(bgr, cfg)
        s = morphology.strings_chain(fe.edge_bin, "rect", bridge2=cfg.bridge_gap2)
        lbl = ccl.label_components_adaptive(
            s, 0, cfg.ccl_passes, cfg.ccl_jumps,
            small_cap=max(4096, h * w // 8), big_cap=spw,
            round_cap=cfg.weak_ccl_round_cap, pieces_ok=True)
        st = ccl.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
        weak_lbl = ccl.filter_strength(lbl, st, cfg.strength_weak)
        strong_lbl = ccl.filter_strength(weak_lbl, st, cfg.strength_strong)
        strong_bin = (strong_lbl > 0).astype(jnp.int32)
        strings = morphology.strings_chain(strong_bin, "poly_branch", bridge2=cfg.bridge_gap2)
        comp = compact_mask((strings != 0).reshape(-1), sp)
        label = ccl.label_components(strings, 0, cfg.ccl_passes,
                                     cfg.ccl_jumps, sparse_cap=sp,
                                     scan_boost=True)
        jn2 = morphology.simple_junction(strings)
        ne = count_ends(jn2, label, comp)
        strings2, label2 = break_loops(strings, label, ne)
        number, _, _ = arc_number(label2, cfg.number_doublings, comp=comp)
        return strings, number

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    ins = [tuple(jax.device_put(np.asarray(x)) for x in prep(f))
           for f in frames]
    strings = [t[0] for t in ins]
    numbers = [t[1] for t in ins]
    dens = float(np.mean(np.asarray(strings[0]) != 0))
    print(f"strings density {dens:.3f}", flush=True)

    bh = pallas_ccl._pick_bh(h, w)

    for name, maps, bgc, mode in (("strings", strings, 0, "equal"),
                                  ("arcs", numbers, 0, "arc")):
        full = jax.jit(lambda x, m=mode, b=bgc:
                       pallas_ccl.label_blocked(x.astype(jnp.int32), b, m))
        t = amortized(full, [(x,) for x in maps], n)
        print(f"{name} exact two-level   {t*1000:9.2f} ms", flush=True)

        p1 = jax.jit(lambda x, m=mode, b=bgc: pallas_ccl._run_blocks(
            x.astype(jnp.int32), None, bgc=b, mode=m, bh=bh,
            interpret=False))
        t = amortized(p1, [(x,) for x in maps], n)
        print(f"{name} unseeded pass     {t*1000:9.2f} ms", flush=True)

        rr = jax.jit(lambda x, m=mode, b=bgc: pallas_ccl._run_blocks(
            x.astype(jnp.int32), None, bgc=b, mode=m, bh=bh,
            interpret=False, want_rounds=True)[1])
        r = np.asarray(rr(maps[0]))
        print(f"{name} rounds/block: {r.tolist()}", flush=True)

        for k in (2, 4, 8):
            fk = jax.jit(lambda x, m=mode, b=bgc, kk=k:
                         pallas_ccl.label_blocked(x.astype(jnp.int32), b, m,
                                                  inner_nb=kk))
            t = amortized(fk, [(x,) for x in maps], n)
            rk = jax.jit(lambda x, m=mode, b=bgc, kk=k:
                         pallas_ccl._run_blocks(
                             x.astype(jnp.int32), None, bgc=b, mode=m,
                             bh=bh, interpret=False, want_rounds=True,
                             inner_nb=kk)[1])
            rv = np.asarray(rk(maps[0]))
            print(f"{name} inner_nb={k}  {t*1000:9.2f} ms  "
                  f"rounds {rv.tolist()}", flush=True)


if __name__ == "__main__":
    main()
