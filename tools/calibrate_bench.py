"""Calibrate the capacity knobs on the bench scene and persist them for
the bench device (plan.txt) — the autotune-on-missing-plan flow of
rect.cpp:86-101 for the benchmark itself.

Density measurement is data-dependent, not device-dependent, so it runs
on CPU (the dense oracle pipeline); only the plan KEY needs the live
device kind, queried from the real platform in a subprocess unless
passed explicitly.

Usage: python tools/calibrate_bench.py [device_kind] [HxW]
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
    args = sys.argv[1:]
    res = next((a for a in args if "x" in a and a[0].isdigit()), None)
    args = [a for a in args if a != res]
    kind = args[0] if args else live_device_kind()
    h, w = (int(v) for v in (res or "720x1280").split("x"))
    print(f"device kind: {kind}, resolution {h}x{w}", flush=True)

    import jax
    jax.config.update("jax_platforms", "cpu")
    from bench import synth_frame
    from rectdetect_tpu.runtime import calibrate as C
    from rectdetect_tpu.runtime import native

    frames = [synth_frame(h, w, seed=s) for s in range(2)]
    C.calibrate(frames, plan_path=C.PLAN_PATH, device_kind=kind)
    print(f"saved plan for {C._key(kind, h, w)}:")
    for k, v in native.plan_load(C.PLAN_PATH, C._key(kind, h, w)).items():
        print(f"  {k} = {v}")


if __name__ == "__main__":
    main()
