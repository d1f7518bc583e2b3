"""TPU AOT compile smoke for every Pallas kernel's VMEM budget.

Compiles (never executes) each Pallas entry point at
{720p, 1080p, 4K} x {bridge2 on/off} on the real TPU, so a scoped-VMEM
stack overflow (the BENCH_r01 failure) surfaces here — in minutes,
before the ~13-minute full-pipeline bench compile — instead of rc=1 in
the official bench.  Run after changing any Pallas kernel body (new
live temporaries change the measured budgets in ops/vmem.py).

Usage:  python tools/vmem_smoke.py [720p|1080p|4k ...]
Exit 0 = all compiled; nonzero = at least one failure (listed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RES = {"720p": (720, 1280), "1080p": (1080, 1920), "4k": (2160, 3840)}


def main(argv):
    names = [a for a in argv[1:] if a in RES] or list(RES)
    import jax
    import jax.numpy as jnp

    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()

    if jax.default_backend() != "tpu":
        print("vmem_smoke: backend is not TPU — budgets are only "
              "enforced by Mosaic on TPU; nothing to check")
        return 0

    from rectdetect_tpu.ops import pallas_morph as pm
    from rectdetect_tpu.ops import pallas_thin as pt
    from rectdetect_tpu.ops import pallas_grad as pg
    from rectdetect_tpu.ops import pallas_blblur as pb
    from rectdetect_tpu.ops import pallas_ccl as pc

    failures = []
    for rname in names:
        h, w = RES[rname]
        i32 = jax.ShapeDtypeStruct((h, w), jnp.int32)
        f32 = jax.ShapeDtypeStruct((h, w), jnp.float32)
        f32v = jax.ShapeDtypeStruct((h, w, 2), jnp.float32)
        f32l = jax.ShapeDtypeStruct((h, w, 3), jnp.float32)

        cases = {
            "morph_chain/rect": lambda: jax.jit(
                lambda x: pm.morph_chain_pallas(x, "rect")).lower(i32),
            "morph_chain/rect+b2": lambda: jax.jit(
                lambda x: pm.morph_chain_pallas(x, "rect", bridge2=True)
            ).lower(i32),
            "morph_chain/poly_branch": lambda: jax.jit(
                lambda x: pm.morph_chain_pallas(x, "poly_branch")
            ).lower(i32),
            "morph_chain/poly_branch+b2": lambda: jax.jit(
                lambda x: pm.morph_chain_pallas(x, "poly_branch",
                                                bridge2=True)).lower(i32),
            "quant_despeckle": lambda: jax.jit(
                lambda p, e: pm.quant_despeckle_pallas(p, e)
            ).lower(i32, f32),
            "merge_mask": lambda: jax.jit(
                lambda x: pm.merge_mask_pallas(x)).lower(i32),
            "distinct_bids": lambda: jax.jit(
                lambda x: pm.distinct_bids_pallas(x)).lower(i32),
            "thinthres": lambda: jax.jit(
                lambda e, v: pt.thinthres_pallas(e, v)).lower(f32, f32v),
            "edge_front": lambda: jax.jit(
                lambda x: pg.edge_front_pallas(x)).lower(f32l),
            "blblur": lambda: jax.jit(
                lambda p, e: pb.blblur_pallas_blocked(p, e)
            ).lower(i32, i32),
            "ccl_pieces": lambda: jax.jit(
                lambda x: pc.label_components_pieces(x, bgc=0, round_cap=48)).lower(i32),
            "ccl_exact": lambda: jax.jit(
                lambda x: pc.label_components_exact(x, bgc=0)).lower(i32),
            "label_merge_exact": lambda: jax.jit(
                lambda p, m, e: pc.label_merge_exact(p, m, e)
            ).lower(i32, i32, i32),
        }
        for cname, make in cases.items():
            t0 = time.perf_counter()
            try:
                make().compile()
                print(f"ok    {rname:5s} {cname:28s} "
                      f"{time.perf_counter() - t0:6.1f}s")
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print(f"FAIL  {rname:5s} {cname:28s} {msg}")
                failures.append((rname, cname, msg))
    if failures:
        print(f"\n{len(failures)} FAILURES")
        for f in failures:
            print("  ", *f)
        return 1
    print("\nall kernels compile within their VMEM budgets")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
