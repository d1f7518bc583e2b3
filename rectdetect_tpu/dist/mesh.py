"""Device mesh construction for the detection fleet.

The reference is strictly single-device (device *selection* only,
oclhelper.c:171-214; no NCCL/MPI anywhere — SURVEY.md §2.6).  The TPU
build adds two orthogonal parallel axes:

  * "stream": frame/stream data parallelism — different frames (from one
    or many video streams) on different chips.  Embarrassingly parallel;
    rides DCN across hosts.
  * "tile":   spatial tile parallelism within one frame — width-tiles on
    different chips with ICI halo exchanges for stencils and seam merges
    for labeling.  For resolutions (4K+) where one chip can't hold the
    frame pipeline at rate.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(n_stream: int, n_tile: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_stream * n_tile
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_stream, n_tile)
    return Mesh(arr, axis_names=("stream", "tile"))


def stream_sharding(mesh: Mesh):
    """Frames stacked on axis 0, sharded over the stream axis."""
    return NamedSharding(mesh, P("stream"))


def tile_sharding(mesh: Mesh):
    """One frame, width (axis 1) sharded over the tile axis."""
    return NamedSharding(mesh, P(None, "tile"))
