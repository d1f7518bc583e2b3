"""Two-process multi-host simulation of the stream-sharded pipeline
(SURVEY.md §4 item 3): each process plays one host with N virtual CPU
chips, joins a jax.distributed job over loopback, and runs
rect_frames_sharded over the global ('stream','tile') mesh.  Verifies
the cross-host path mechanically (device visibility, sharded dispatch,
result gather) and prints per-host frame throughput.

Usage: python tools/multihost_sim.py [n_hosts] [chips_per_host] [HxW]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def worker(host_id: int, n_hosts: int, chips: int, res: str, port: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={chips} "
        + os.environ.get("XLA_FLAGS", ""))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n_hosts,
                               process_id=host_id)
    import math
    import numpy as np
    from rectdetect_tpu.dist.mesh import make_mesh
    from rectdetect_tpu.dist.stream import rect_frames_sharded
    from bench import synth_frame

    h, w = (int(v) for v in res.split("x"))
    n_dev = len(jax.devices())
    assert n_dev == n_hosts * chips, (n_dev, n_hosts, chips)
    mesh = make_mesh(n_dev, 1)
    tan = math.tan(math.radians(72) / 2)

    # one frame per global stream slot; every host materializes the full
    # batch host-side (ingest is per-host in production; for the harness
    # the content just has to agree)
    frames = np.stack([synth_frame(h, w, seed=s) for s in range(n_dev)])

    res1 = rect_frames_sharded(frames, tan, mesh)
    # readback of this host's addressable shard forces completion
    local = [s for s in res1.value.addressable_shards]
    np.asarray(local[0].data).ravel()[:1]
    t0 = time.perf_counter()
    n_iter = 3
    for _ in range(n_iter):
        res1 = rect_frames_sharded(frames, tan, mesh)
    local = [s for s in res1.value.addressable_shards]
    for s in local:
        np.asarray(s.data).ravel()[:1]
    dt = (time.perf_counter() - t0) / n_iter
    n_valid = sum(int(np.asarray(s.data).size) for s in local)
    print(f"[host {host_id}] {n_dev} global devs, "
          f"{len(local)} local shards, batch {n_dev} frames in "
          f"{dt*1000:.0f} ms -> {n_dev/dt:.2f} frames/s global",
          flush=True)
    return 0


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        sys.exit(worker(int(sys.argv[2]), int(sys.argv[3]),
                        int(sys.argv[4]), sys.argv[5],
                        int(sys.argv[6])))
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    chips = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    res = sys.argv[3] if len(sys.argv) > 3 else "72x96"
    port = 12973
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(i), str(n_hosts),
         str(chips), res, str(port)])
        for i in range(n_hosts)]
    rc = [p.wait() for p in procs]
    print("exit codes:", rc)
    sys.exit(max(rc))


if __name__ == "__main__":
    main()
