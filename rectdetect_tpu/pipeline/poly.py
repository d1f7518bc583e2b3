"""The poly/vidpoly pipeline: frame -> refined line segments.

Mirrors poly.cpp:104-123 / vidpoly.cpp:151-166: edge front-end, weak-edge
strength filter, then the full polyline stage."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG
from rectdetect_tpu.ops import ccl, polyline
from rectdetect_tpu.pipeline.frontend import edge_frontend


@functools.partial(jax.jit, static_argnames=("cfg", "minerror", "size_thre",
                                             "strength"))
def poly_frame(bgr, cfg: PipelineConfig = DEFAULT_CONFIG,
               minerror: float = 1.0, size_thre: int = 20,
               strength: int = 500):
    """BGR (H,W,3) uint8 -> (SegmentArena, lsid image).

    Defaults are the poly tool's (poly.cpp:120-123); vidpoly uses
    strength=2000, size_thre=10 (vidpoly.cpp:158-166)."""
    h, w = bgr.shape[:2]
    fe = edge_frontend(bgr, cfg)

    # labels feed only the strength filter, so round-capped block-local
    # pieces are output-equivalent (same argument as rect_tail's weak
    # instance; validated in test_pallas_ccl) and much cheaper on TPU
    lbl = ccl.label_components_adaptive(
        fe.edge_bin, 0, cfg.ccl_passes, cfg.ccl_jumps,
        small_cap=max(4096, h * w // 8),
        big_cap=max(4096, h * w // 2),   # raw thinned map: ~32% density
        round_cap=cfg.weak_ccl_round_cap, pieces_ok=True)
    st = ccl.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
    filtered = ccl.filter_strength(lbl, st, strength)
    if cfg.strength_rescue_rounds:
        filtered = ccl.rescue_filtered(lbl, filtered,
                                       cfg.strength_rescue_rounds)
    edge = (filtered > 0).astype(jnp.int32)

    cap = cfg.ls_cap_for(w, h)
    return polyline.polyline_execute(edge, minerror, size_thre, cap, cfg)


def live_segments(arena):
    """Host-side convenience: dicts for live segments keyed by arena id
    (mirrors the poly.cpp:137-154 drawing walk)."""
    import numpy as np
    a = {k: np.asarray(v) for k, v in arena._asdict().items()}
    out = []
    for g in range(1, int(a["count"]) + 1):
        if a["polyid"][g] == 0:
            continue
        out.append({"id": g,
                    "x0": float(a["sx"][g]), "y0": float(a["sy"][g]),
                    "x1": float(a["ex"][g]), "y1": float(a["ey"][g]),
                    "left": int(a["left_ptr"][g]),
                    "right": int(a["right_ptr"][g])})
    return out
