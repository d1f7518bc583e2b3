"""Stream/frame data parallelism.

Shards a stack of frames over the "stream" mesh axis and runs the full
single-chip pipeline per frame.  This is the scaling path for multi-
stream/multi-host serving (SURVEY.md §7: it alone covers the 2-host
efficiency target — per-frame work is independent, the only cross-host
traffic is frame ingest)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG
from rectdetect_tpu.pipeline.rect import rect_frame
from rectdetect_tpu.pipeline.poly import poly_frame


def rect_frames_sharded(frames, tan_aov, mesh,
                        cfg: PipelineConfig = DEFAULT_CONFIG):
    """frames: (B, H, W, 3) uint8, B divisible by mesh 'stream' size.
    Returns a RectResult with a leading B axis, frames sharded over the
    stream axis."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("stream"), P()),
        out_specs=P("stream"),
        check_vma=False)
    def run(local_frames, tan):
        return jax.vmap(lambda f: rect_frame(f, tan[0], cfg))(local_frames)

    return jax.jit(run)(frames, jnp.asarray([tan_aov], jnp.float32))


class StreamSupervisor:
    """Fault-tolerant multi-stream serving (SURVEY.md §5 "failure
    detection": the reference fails fast on any CL error,
    oclhelper.c:113-138; a production multi-chip server needs stream-
    level restart instead).

    Each stream is pinned to one device and served by that device's own
    jitted program — deliberately NOT one SPMD program, so a failing
    chip cannot poison a collective.  A device whose dispatch or
    readback raises is quarantined and its streams move to the healthy
    device with the fewest streams; frames in flight on the failed chip
    are dropped (equivalent to a dropped camera frame — the pipeline is
    stateless per frame, SURVEY.md §5 checkpoint row).

    `run_fn(bgr, device) -> result futures` and `read_fn(result) ->
    host value` default to the rect pipeline; tests inject failing
    stand-ins to exercise the supervisor without broken hardware.
    """

    def __init__(self, tan_aov: float = 1.0,
                 cfg: PipelineConfig = DEFAULT_CONFIG, devices=None,
                 run_fn=None, read_fn=None, max_in_flight: int = 2):
        from rectdetect_tpu.pipeline.rect import live_rects

        self._devices = list(devices if devices is not None
                             else jax.devices())
        self._healthy = {i: True for i in range(len(self._devices))}
        self._assign: dict = {}              # stream id -> device index
        self._pending: dict = {}             # stream id -> [futures]
        self._max_in_flight = max_in_flight
        self._failures: list = []            # (device index, repr(err))
        if run_fn is None:
            def run_fn(bgr, device):
                frame = jax.device_put(bgr, device)
                return rect_frame(frame, tan_aov, cfg)
        if read_fn is None:
            def read_fn(res):
                jax.block_until_ready(res.c2)
                return live_rects(res)
        self._run = run_fn
        self._read = read_fn

    # -- placement ---------------------------------------------------------

    def _load(self, di: int) -> int:
        return sum(1 for d in self._assign.values() if d == di)

    def _place(self, sid) -> int:
        alive = [i for i in self._healthy if self._healthy[i]]
        if not alive:
            raise RuntimeError("StreamSupervisor: no healthy devices left")
        di = self._assign.get(sid)
        if di is None or not self._healthy[di]:
            di = min(alive, key=lambda i: (self._load(i), i))
            self._assign[sid] = di
        return di

    def _quarantine(self, di: int, err: BaseException):
        self._healthy[di] = False
        self._failures.append((di, repr(err)))
        for sid, d in list(self._assign.items()):
            if d == di:
                del self._assign[sid]        # re-placed on next submit
                self._pending.pop(sid, None)  # in-flight frames dropped

    # -- serving -----------------------------------------------------------

    def submit(self, sid, bgr) -> bool:
        """Dispatch one frame of stream `sid`; returns False if the frame
        was shed (back-pressure).  Retries once on a fresh device if the
        first dispatch kills its device."""
        for _ in range(2):
            di = self._place(sid)
            q = self._pending.setdefault(sid, [])
            if len(q) >= self._max_in_flight:
                return False
            try:
                q.append((di, self._run(bgr, self._devices[di])))
                return True
            except Exception as e:          # noqa: BLE001 — device loss
                self._quarantine(di, e)
        return False

    def collect(self, sid):
        """Block on stream `sid`'s oldest in-flight frame; returns the
        host-side result, or None if nothing is in flight (including
        frames lost to a quarantined device)."""
        q = self._pending.get(sid)
        if not q:
            return None
        di, fut = q.pop(0)
        try:
            return self._read(fut)
        except Exception as e:              # noqa: BLE001 — device loss
            self._quarantine(di, e)
            return None

    @property
    def healthy_devices(self):
        return [self._devices[i] for i in self._healthy if self._healthy[i]]

    @property
    def failures(self):
        return list(self._failures)


def poly_frames_sharded(frames, mesh, cfg: PipelineConfig = DEFAULT_CONFIG,
                        minerror: float = 1.0, size_thre: int = 20,
                        strength: int = 500):
    """Sharded poly pipeline over a frame stack; returns stacked arenas."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P("stream"),
        out_specs=P("stream"),
        check_vma=False)
    def run(local_frames):
        return jax.vmap(lambda f: poly_frame(
            f, cfg, minerror, size_thre, strength))(local_frames)

    return jax.jit(run)(frames)
