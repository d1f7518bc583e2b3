"""Calibrate the capacity knobs on the bench scene and persist them for
the bench device (plan.txt) — the autotune-on-missing-plan flow of
rect.cpp:86-101 for the benchmark itself.

Density measurement is data-dependent, not device-dependent, so it runs
on CPU (the dense oracle pipeline); only the plan KEY needs the live
device kind, queried from the real platform in a subprocess unless
passed explicitly.

Usage: python tools/calibrate_bench.py [device_kind]
"""
from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, ".")


def live_device_kind() -> str:
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].device_kind)"],
        capture_output=True, text=True, timeout=300)
    if out.returncode != 0:
        raise RuntimeError(f"device query failed: {out.stderr[-400:]}")
    return out.stdout.strip().splitlines()[-1]


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else live_device_kind()
    print(f"device kind: {kind}", flush=True)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    from bench import synth_frame
    from rectdetect_tpu.config import DEFAULT_CONFIG
    from rectdetect_tpu.runtime import calibrate as C
    from rectdetect_tpu.runtime import native

    h, w = 720, 1280
    frames = [synth_frame(h, w, seed=s) for s in range(2)]
    (edge_d, rect_d, strings_d, boundary_d, arcs_d, arcs,
     cyc_d) = C._densities(frames, DEFAULT_CONFIG)
    print(f"edge={edge_d:.4f} rect_strings={rect_d:.4f} "
          f"strings={strings_d:.4f} boundary={boundary_d:.4f} "
          f"arcs={arcs_d:.4f} n_arcs={arcs} cyc={cyc_d:.5f}", flush=True)

    # same derivation as calibrate(), but keyed by the LIVE device kind
    def factor_for(density, cap=64):
        d = min(max(density * C.MARGIN, 1e-4), 1.0)
        return max(1, min(cap, int(1.0 / d)))

    new = dataclasses.replace(
        DEFAULT_CONFIG,
        sparse_factor=factor_for(rect_d, cap=16),
        strings_sparse_factor=factor_for(strings_d, cap=24),
        strings_small_factor=max(1, min(
            40, int(1.0 / min(max(strings_d * 1.5, 1e-4), 1.0)))),
        boundary_sparse_factor=factor_for(boundary_d, cap=32),
        arc_sparse_factor=factor_for(arcs_d, cap=128),
        cycle_sparse_factor=factor_for(cyc_d, cap=256),
        ls_capacity=int(min(max(arcs * 4 * C.MARGIN, 4096), 262144)),
    )
    native.plan_save(C.PLAN_PATH, C._key(kind, h, w), {
        "sparse_factor": str(new.sparse_factor),
        "strings_sparse_factor": str(new.strings_sparse_factor),
        "strings_small_factor": str(new.strings_small_factor),
        "boundary_sparse_factor": str(new.boundary_sparse_factor),
        "arc_sparse_factor": str(new.arc_sparse_factor),
        "cycle_sparse_factor": str(new.cycle_sparse_factor),
        "ls_capacity": str(new.ls_capacity),
    })
    print(f"saved plan for {C._key(kind, h, w)}:")
    for k, v in native.plan_load(C.PLAN_PATH, C._key(kind, h, w)).items():
        print(f"  {k} = {v}")


if __name__ == "__main__":
    main()
