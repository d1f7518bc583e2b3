"""A/B: frame-at-a-time rect_frame vs vmapped rect_frames throughput.

An earlier measurement found B=4 batching SLOWER per frame (row-rate
bound ops, docs/STATUS.md negative results); the pipeline has since
moved most table work onto compacted slot lists, which vmap multiplies
without the per-op fixed costs — re-measure whenever kernels change.

Amortized single-readback protocol.  Usage:
python tools/batch_ab.py [HxW] [n_iter] [batches...]
"""
from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batches = [int(b) for b in sys.argv[3:]] or [2, 4]
    h, w = (int(v) for v in res.split("x"))

    import jax
    import numpy as np
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from bench import synth_frame
    from rectdetect_tpu.pipeline.rect import rect_frame, rect_frames
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config

    cfg = load_calibrated_config(h, w, verbose=True)
    tan = math.tan(math.radians(72.0) / 2)
    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(4)]

    r = rect_frame(frames[0], tan, cfg)
    np.asarray(r.value)[:1]
    t0 = time.perf_counter()
    for i in range(n_iter):
        r = rect_frame(frames[i % 2], tan, cfg)
    np.asarray(r.value)[:1]
    fps1 = n_iter / (time.perf_counter() - t0)
    print(json.dumps({"mode": "single", "fps": round(fps1, 2)}))

    # pinned config: the runtime capacity switches are lax.conds that a
    # vmapped (batched) predicate turns into run-both-branches selects;
    # serving pins them from the plan (load_calibrated_config batch=True)
    cfg_pin = load_calibrated_config(h, w, batch=True)
    for b in batches:
        import jax.numpy as jnp
        batch = jnp.stack([frames[i % 4] for i in range(b)])
        for label, c in (("cond", cfg), ("pinned", cfg_pin)):
            rb = rect_frames(batch, tan, c)
            np.asarray(rb.value)[:1, :1]
            t0 = time.perf_counter()
            for _ in range(n_iter):
                rb = rect_frames(batch, tan, c)
            np.asarray(rb.value)[:1, :1]
            fps = b * n_iter / (time.perf_counter() - t0)
            print(json.dumps({"mode": f"batch{b}/{label}",
                              "fps": round(fps, 2),
                              "vs_single": round(fps / fps1, 3)}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
