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

    # ---- phase 2: width-tiled step over the (stream, tile) mesh --------
    # one stream per host, its frame width-sharded over the host's chips:
    # halo ppermutes, seam-graph resolves, psum'd tables and the sharded
    # slot loops all run over the distributed backend.
    import functools
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rectdetect_tpu.config import PipelineConfig
    from rectdetect_tpu.dist import tile as dtile
    from rectdetect_tpu.pipeline.rect import rect_frame

    cfg2 = PipelineConfig(ls_capacity=256, max_groups=16,
                          max_group_segs=16, number_doublings=10)
    mesh2 = make_mesh(n_hosts, chips)
    fr2 = np.stack([synth_frame(h, w, seed=100 + s)
                    for s in range(n_hosts)])

    @functools.partial(
        shard_map, mesh=mesh2,
        in_specs=(P("stream", None, "tile", None), P()),
        out_specs=P("stream"), check_vma=False)
    def step(local_frames, tan_):
        def one(ft):
            return dtile.rect_step_tiled(ft, tan_[0], halo=8, cfg=cfg2)
        import jax as _jax
        return _jax.vmap(one)(local_frames)

    arr = jax.device_put(
        fr2, NamedSharding(mesh2, P("stream", None, "tile", None)))
    res2 = jax.jit(step)(arr, jnp.asarray([tan], jnp.float32))
    mine = res2.valid.addressable_shards[0]
    got_valid = np.asarray(mine.data)[0]
    ref = rect_frame(jnp.asarray(fr2[host_id]), tan, cfg2)
    agree = float((np.asarray(ref.valid) == got_valid).mean())
    print(f"[host {host_id}] tiled step: valid-mask agreement vs "
          f"single-process {agree:.3f}", flush=True)
    assert agree >= 0.9, agree
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
