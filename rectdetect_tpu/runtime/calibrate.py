"""Per-device/per-resolution calibration, persisted like the reference's
autotune plan.

The reference profiles every kernel over a grid of local work-group sizes
and persists the winners per device in plan.txt (oclhelper.c:312-605,
driven by rect.cpp:86-101).  XLA owns that level of tuning here; what is
worth calibrating for this pipeline are the *capacity* knobs that trade
silent truncation against gather cost:

  * sparse_factor / boundary_sparse_factor — slot-list sizes for the
    labeling machinery (cost scales linearly with them);
  * ls_capacity — the segment arena.

`calibrate()` measures the actual foreground densities on sample frames
(with a safety margin), derives the tightest safe capacities, and
persists them with runtime.native.plan_save keyed by device kind and
resolution; `load_calibrated_config()` applies them at startup — the
moral equivalent of loadPlan at app start (rect.cpp:86)."""

from __future__ import annotations

import dataclasses

import numpy as np

from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG
from rectdetect_tpu.runtime import native

PLAN_PATH = "plan.txt"
MARGIN = 1.6


def _densities(bgr_frames, cfg: PipelineConfig):
    import jax
    import jax.numpy as jnp
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from rectdetect_tpu.ops import morphology, ccl, regions

    @jax.jit
    def stats(bgr):
        fe = edge_frontend(bgr, cfg)
        jn = morphology.simple_junction(fe.edge_bin, positive_only=True)
        conn = morphology.simple_connect_rect(jn)
        s = morphology.stringify(conn, 0)
        s = morphology.stringify(s, 1)
        lbl = ccl.label_components(s, 0, cfg.ccl_passes, cfg.ccl_jumps)
        st = ccl.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
        weak = ccl.filter_strength(lbl, st, cfg.strength_weak)
        strong = ccl.filter_strength(weak, st, cfg.strength_strong)
        dense_r, _ = ccl.relabel_dense(
            jnp.where(strong > 0, strong, 0))
        return (jnp.mean((s != 0).astype(jnp.float32)),
                jnp.mean((strong > 0).astype(jnp.float32)),
                jnp.max(dense_r))

    edge_d, strong_d, arcs = 0.0, 0.0, 0
    for f in bgr_frames:
        e, sd, a = stats(f)
        edge_d = max(edge_d, float(e))
        strong_d = max(strong_d, float(sd))
        arcs = max(arcs, int(a))
    return edge_d, strong_d, arcs


def _key(device_kind: str, h: int, w: int) -> str:
    return f"{device_kind}|{h}x{w}".replace(" ", "_")


def calibrate(bgr_frames, cfg: PipelineConfig = DEFAULT_CONFIG,
              plan_path: str = PLAN_PATH) -> PipelineConfig:
    """Measure densities on sample frames, derive tight safe capacities,
    persist, and return the calibrated config."""
    import jax
    h, w = np.asarray(bgr_frames[0]).shape[:2]
    edge_d, strong_d, arcs = _densities(bgr_frames, cfg)

    def factor_for(density):
        d = min(max(density * MARGIN, 1e-3), 1.0)
        return max(1, min(16, int(1.0 / d)))

    new = dataclasses.replace(
        cfg,
        sparse_factor=factor_for(edge_d),
        boundary_sparse_factor=factor_for(max(edge_d, strong_d)),
        ls_capacity=int(min(max(arcs * 4 * MARGIN, 4096), 262144)),
    )
    dev = jax.devices()[0].device_kind
    native.plan_save(plan_path, _key(dev, h, w), {
        "sparse_factor": str(new.sparse_factor),
        "boundary_sparse_factor": str(new.boundary_sparse_factor),
        "ls_capacity": str(new.ls_capacity),
    })
    return new


def load_calibrated_config(h: int, w: int,
                           cfg: PipelineConfig = DEFAULT_CONFIG,
                           plan_path: str = PLAN_PATH) -> PipelineConfig:
    """Apply a persisted calibration if one exists (loadPlan analog)."""
    import jax
    dev = jax.devices()[0].device_kind
    entries = native.plan_load(plan_path, _key(dev, h, w))
    if not entries:
        return cfg
    return dataclasses.replace(
        cfg,
        sparse_factor=int(entries.get("sparse_factor",
                                      cfg.sparse_factor)),
        boundary_sparse_factor=int(entries.get(
            "boundary_sparse_factor", cfg.boundary_sparse_factor)),
        ls_capacity=int(entries.get("ls_capacity", cfg.ls_capacity)),
    )
