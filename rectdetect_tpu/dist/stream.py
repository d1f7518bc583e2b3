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
