"""Decompose the Pallas CCL cost at a given resolution: per-round cost,
inferred convergence rounds, seam/second-pass overhead.  Amortized
single-readback protocol (tools/stage_bench.py).

Usage: python tools/ccl_tune.py [HxW] [N]
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    sys.path.insert(0, ".")
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from rectdetect_tpu.config import DEFAULT_CONFIG as cfg
    from rectdetect_tpu.ops import morphology, pallas_ccl
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

    full = jax.jit(lambda s: pallas_ccl.label_components_exact(s, 0))
    t = amortized(full, [(s,) for s in strings], n)
    print(f"full two-level        {t*1000:9.2f} ms", flush=True)

    # first block pass only (unseeded)
    bh = pallas_ccl._pick_bh(h, w)
    p1 = jax.jit(lambda s: pallas_ccl._run_blocks(
        s.astype(jnp.int32), None, bgc=0, mode="equal", bh=bh,
        interpret=False))
    t1 = amortized(p1, [(s,) for s in strings], n)
    print(f"block pass (unseeded) {t1*1000:9.2f} ms", flush=True)

    # seam union + resolve + seeded pass split
    lbls = [p1(s) for s in strings]

    def seam_part(s, lbl):
        t_ = pallas_ccl._seam_union(s, lbl, bgc=0, mode="equal", bh=bh)
        rows = list(range(bh - 1, h - 1, bh))
        seam_rows = rows + [r + 1 for r in rows]
        sv = jnp.stack([lbl[r] for r in seam_rows])
        return pallas_ccl._resolve(t_, sv)

    sp = jax.jit(seam_part)
    t2 = amortized(sp, list(zip(strings, lbls)), n)
    print(f"seam union+resolve    {t2*1000:9.2f} ms", flush=True)

    # fixed-round block kernel: infer per-round cost from the slope
    def fixed_rounds_kernel(k):
        def kern(pix_ref, out_ref):
            import jax as _jax
            blk = pl.program_id(0)
            pix = pix_ref[:]
            body = functools.partial(
                pallas_ccl._ccl_block_kernel, bgc=0, mode="equal",
                h=h, w=w, bh=bh, seeded=False)
            # re-implement: run exactly k rounds (no convergence check)
            ly = _jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0)
            xx = _jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
            yy = ly + blk * bh
            sent = jnp.int32(h * w)
            pixv = jnp.where(yy < h, pix, 0)
            fg = pixv != 0
            idx = yy * w + xx
            label = jnp.where(fg, idx, sent)

            def sh(arr, dy, dx, fill):
                v = arr
                if dy:
                    v = jnp.roll(v, -dy, 0)
                if dx:
                    v = jnp.roll(v, -dx, 1)
                ok = None
                if dy:
                    ok = (ly + dy >= 0) & (ly + dy < bh)
                if dx:
                    okx = (xx + dx >= 0) & (xx + dx < w)
                    ok = okx if ok is None else (ok & okx)
                return v if ok is None else jnp.where(ok, v, fill)

            from rectdetect_tpu.ops.shifts import NEIGH8
            fg_i = fg.astype(jnp.int32)
            nb_ok = []
            for (dy, dx) in NEIGH8:
                ok = fg & (sh(fg_i, dy, dx, 0) != 0) & \
                    (sh(pixv, dy, dx, 0) == pixv)
                nb_ok.append(ok.astype(jnp.int32))
            conn_l = nb_ok[NEIGH8.index((0, -1))]
            conn_u = nb_ok[NEIGH8.index((-1, 0))]

            def seg_scan(v, conn, axis, reverse, length):
                if reverse:
                    f = sh(conn, 0, 1, 0) if axis == 1 else sh(conn, 1, 0, 0)
                else:
                    f = conn
                d = 1
                while d < length:
                    step = d if reverse else -d
                    if axis == 1:
                        v_sh = sh(v, 0, step, sent)
                        f_sh = sh(f, 0, step, 0)
                    else:
                        v_sh = sh(v, step, 0, sent)
                        f_sh = sh(f, step, 0, 0)
                    v = jnp.where(f != 0, jnp.minimum(v, v_sh), v)
                    f = f & f_sh
                    d *= 2
                return v

            def one_round(lbl):
                g = lbl
                for ok, (dy, dx) in zip(nb_ok, NEIGH8):
                    g = jnp.minimum(g, jnp.where(ok != 0,
                                                 sh(lbl, dy, dx, sent), sent))
                g = seg_scan(g, conn_l, 1, False, w)
                g = seg_scan(g, conn_l, 1, True, w)
                g = seg_scan(g, conn_u, 0, False, bh)
                g = seg_scan(g, conn_u, 0, True, bh)
                return g

            for _ in range(k):
                label = one_round(label)
            out_ref[:] = label
        return kern

    for k in (1, 2, 4, 8):
        nb = pl.cdiv(h, bh)
        spec = pl.BlockSpec((bh, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        f = jax.jit(lambda s, k=k: pl.pallas_call(
            fixed_rounds_kernel(k),
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
            grid=(nb,), in_specs=[spec], out_specs=spec,
        )(s.astype(jnp.int32)))
        tk = amortized(f, [(s,) for s in strings], n)
        print(f"fixed {k} rounds       {tk*1000:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
