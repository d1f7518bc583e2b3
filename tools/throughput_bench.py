"""Throughput at the BASELINE.md measurement points: frames/s at 1 chip,
1 host (all local chips, stream-parallel), and a pointer to the N-host
path (tools/multihost_sim.py runs the same step across processes).

Prints one JSON line per configuration.  Uses the amortized
single-readback protocol (relay transports ack enqueue, not completion —
see CLAUDE.md).

Usage: python tools/throughput_bench.py [HxW] [n_iter]
"""
from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    h, w = (int(v) for v in res.split("x"))

    import jax
    import numpy as np
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from bench import synth_frame
    from rectdetect_tpu.pipeline.rect import rect_frame
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config

    cfg = load_calibrated_config(h, w, verbose=True)
    tan = math.tan(math.radians(72.0) / 2)
    devs = jax.devices()
    frames = [synth_frame(h, w, seed=s) for s in range(max(2, len(devs)))]

    # ---- 1 chip: single-frame latency loop (the bench.py metric) -------
    d0 = devs[0]
    f0 = [jax.device_put(f, d0) for f in frames[:2]]
    r = rect_frame(f0[0], tan, cfg)
    np.asarray(r.value)[:1]
    t0 = time.perf_counter()
    for i in range(n_iter):
        r = rect_frame(f0[i % 2], tan, cfg)
    np.asarray(r.value)[:1]
    fps1 = n_iter / (time.perf_counter() - t0)
    print(json.dumps({"metric": "fps_1chip", "value": round(fps1, 2),
                      "unit": "frames/s", "resolution": res}))

    # ---- 1 host: streams over all local chips --------------------------
    if len(devs) > 1:
        from rectdetect_tpu.dist.mesh import make_mesh
        from rectdetect_tpu.dist.stream import rect_frames_sharded
        mesh = make_mesh(len(devs), 1)
        batch = np.stack(frames[:len(devs)])
        rs = rect_frames_sharded(batch, tan, mesh, cfg=cfg)
        np.asarray(rs.value)[:1, :1]
        t0 = time.perf_counter()
        for _ in range(n_iter):
            rs = rect_frames_sharded(batch, tan, mesh, cfg=cfg)
        np.asarray(rs.value)[:1, :1]
        fps_host = len(devs) * n_iter / (time.perf_counter() - t0)
        print(json.dumps({"metric": "fps_1host", "value": round(fps_host, 2),
                          "unit": "frames/s", "chips": len(devs),
                          "scaling_efficiency":
                              round(fps_host / (fps1 * len(devs)), 3)}))
    else:
        print(json.dumps({"metric": "fps_1host", "note":
                          "single visible chip — equals fps_1chip; "
                          "run under a multi-chip runtime for scaling"}))
    print(json.dumps({"metric": "fps_nhosts", "note":
                      "run tools/multihost_sim.py N chips HxW — same "
                      "stream-sharded step across jax.distributed "
                      "processes; prints global frames/s per host"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
