"""Multi-host deployment: jax.distributed + cross-host stream sharding.

The reference is single-process/single-device (SURVEY.md §2.6).  The
multi-host story here is stream parallelism over DCN: every host ingests
its own camera/video streams and runs the per-frame pipeline on its local
chips; the global mesh exists so results can be gathered (or further
tile-parallelism used within a host's ICI domain).  Per-frame work never
crosses hosts — DCN carries only frame ingest and result collection, which
is what makes the >= 80% two-host scaling target trivially achievable
(BASELINE.md).

Typical launch (one process per host):

    python -m rectdetect_tpu.dist.multihost --coordinator=host0:1234 \
        --num-hosts=2 --host-id=0 -- <vidrect args>
"""

from __future__ import annotations

import jax
import numpy as np

from rectdetect_tpu.dist.mesh import make_mesh


def init(coordinator: str | None = None, num_hosts: int = 1,
         host_id: int = 0) -> None:
    """Initialize jax.distributed when running multi-host (no-op for 1)."""
    if num_hosts > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_hosts,
                                   process_id=host_id)


def global_stream_mesh(n_tile: int = 1):
    """Mesh over every chip in the job: ('stream', 'tile')."""
    n = len(jax.devices())
    return make_mesh(n // n_tile, n_tile)


def local_stream_slots():
    """The stream-axis rows owned by this host — the frames this host
    should ingest.  With B total stream slots, host h feeds slots
    [lo, hi)."""
    devs = jax.devices()
    local = set(d.id for d in jax.local_devices())
    slots = [i for i, d in enumerate(devs) if d.id in local]
    return min(slots), max(slots) + 1


def run_streams(frame_sources, tan_aov, n_tile: int = 1, cfg=None):
    """Serve multiple streams across all hosts' chips.

    frame_sources: list of callables () -> (H,W,3) uint8 BGR or None,
    one per local stream slot (e.g. runtime.native.FramePump.next).
    Yields per-batch RectResults for the local slots.  Single-host this
    degenerates to batched multi-stream serving."""
    from rectdetect_tpu.dist.stream import rect_frames_sharded
    from rectdetect_tpu.config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    mesh = global_stream_mesh(n_tile)
    lo, hi = local_stream_slots()
    n_local = hi - lo
    if len(frame_sources) != n_local:
        raise ValueError(f"host owns {n_local} stream slots, "
                         f"got {len(frame_sources)} sources")

    while True:
        frames = []
        for src in frame_sources:
            f = src()
            if f is None:
                return
            frames.append(f)
        batch = np.stack(frames)
        res = rect_frames_sharded(batch, tan_aov, mesh, cfg)
        yield res
