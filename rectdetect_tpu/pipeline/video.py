"""Double-buffered realtime video driver.

The reference pipelines frame n's GPU DAG against frame n-1's CPU stage
with a two-page event system (oclrect_enqueueTask/pollTask,
oclrect.c:1248-1278; loop vidrect.cpp:159-205).  JAX dispatch is already
asynchronous, so the TPU equivalent is simpler: `enqueue` device_puts the
frame and launches the jitted program (returns immediately with futures);
`poll` blocks on the *previous* frame's outputs and converts them to the
host rect list.  Device compute for frame n thus overlaps host drawing /
capture for frame n-1, like the reference."""

from __future__ import annotations

import time

import jax
import numpy as np

from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG
from rectdetect_tpu.pipeline.rect import rect_frame, live_rects
from rectdetect_tpu.pipeline.poly import poly_frame, live_segments


class VideoRectDetector:
    """enqueue/poll pair mirroring oclrect_enqueueTask/pollTask."""

    def __init__(self, tan_aov: float, cfg: PipelineConfig = DEFAULT_CONFIG,
                 device=None):
        self._tan = tan_aov
        self._cfg = cfg
        self._dev = device
        self._pending = []

    def enqueue(self, bgr: np.ndarray) -> None:
        frame = jax.device_put(bgr, self._dev)
        self._pending.append(rect_frame(frame, self._tan, self._cfg))

    def poll(self):
        """Block on the oldest in-flight frame; returns the host rect
        list.  Returns None if nothing is in flight."""
        if not self._pending:
            return None
        res = self._pending.pop(0)
        jax.block_until_ready(res.c2)
        return live_rects(res)


class TiledVideoRectDetector:
    """enqueue/poll driver for the width-tiled detection step: each
    frame's width is sharded over `n_tiles` chips (dist/tile.py sharded
    tail — halo stencils, cross-tile CCL, psum'd tables), the geometry
    tail runs replicated.  For resolutions (4K+) where one chip can't
    hold the frame pipeline at rate (SURVEY.md §7 step 7b)."""

    def __init__(self, tan_aov: float, cfg: PipelineConfig = DEFAULT_CONFIG,
                 n_tiles: int = 2, devices=None):
        import functools
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from rectdetect_tpu.dist import mesh as dmesh
        from rectdetect_tpu.dist import tile as dtile

        self._tan = tan_aov
        self._cfg = cfg
        self._mesh = dmesh.make_mesh(1, n_tiles, devices)
        self._n_tiles = n_tiles
        self._pending = []

        @functools.partial(
            shard_map, mesh=self._mesh,
            in_specs=(P(None, "tile", None), P()), out_specs=P(),
            check_vma=False)
        def _step(frame_tile, tan):
            return dtile.rect_step_tiled(frame_tile, tan, cfg=cfg)

        self._step = jax.jit(_step)
        self._sharding = dmesh.NamedSharding(self._mesh,
                                             P(None, "tile", None))

    def enqueue(self, bgr: np.ndarray) -> None:
        w = bgr.shape[1]
        if w % self._n_tiles:
            raise ValueError(f"width {w} not divisible by "
                             f"{self._n_tiles} tiles")
        frame = jax.device_put(bgr, self._sharding)
        self._pending.append(self._step(frame, np.float32(self._tan)))

    def poll(self):
        if not self._pending:
            return None
        res = self._pending.pop(0)
        jax.block_until_ready(res.c2)
        return live_rects(res)


class VideoPolyDetector:
    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG,
                 minerror: float = 1.0, size_thre: int = 10,
                 strength: int = 2000, device=None):
        self._cfg = cfg
        self._args = (minerror, size_thre, strength)
        self._dev = device
        self._pending = []

    def enqueue(self, bgr: np.ndarray) -> None:
        frame = jax.device_put(bgr, self._dev)
        me, st, sg = self._args
        self._pending.append(poly_frame(frame, self._cfg, me, st, sg))

    def poll(self):
        if not self._pending:
            return None
        arena, lsid = self._pending.pop(0)
        jax.block_until_ready(arena.sx)
        return live_segments(arena)


class FpsMeter:
    """Per-second fps printer (vidrect.cpp:194-199)."""

    def __init__(self):
        self._t = time.monotonic()
        self._n = 0
        self._last = 0

    def tick(self) -> float | None:
        self._n += 1
        t = time.monotonic()
        if t - self._t > 1.0:
            fps = (self._n - self._last) / (t - self._t)
            self._t = t
            self._last = self._n
            return fps
        return None
