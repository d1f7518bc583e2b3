"""Shared edge front-end: BGR frame -> thinned edge magnitude + binaries.

Mirrors the head of genGPUTask (oclrect.c:245-263) and the poly tool's
hand-built pipeline (poly.cpp:104-121): packed-Lab conversion, r=2
Gaussian blur per channel, edge direction from the blurred L plane, Lab
edge magnitude, bicubic non-max-suppression thinning.

All values live on the packed-Lab lattice exactly where the reference's
do (the blur operates on unpacked lattice centers; the edge operator reads
the re-packed blurred image)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rectdetect_tpu.core import color
from rectdetect_tpu.ops import blur, gradient, thin
from rectdetect_tpu.ops.pallas_grad import edge_front_pallas
from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG


class EdgeFrontend(NamedTuple):
    packed0: jnp.ndarray    # original packed Lab (buf[0])
    labb: jnp.ndarray       # blurred Lab float planes (H,W,3)
    edge_thin: jnp.ndarray  # thinned edge magnitude (buf[1] after :258)
    edge_bin: jnp.ndarray   # int 0/1 binary of edge_thin > 0


def edge_frontend(bgr, cfg: PipelineConfig = DEFAULT_CONFIG) -> EdgeFrontend:
    if cfg.color_exact:
        # bit-parity mode: the reference's fixed-point LUT conversion
        # (srgb2plab) feeds the whole chain (core/color.py)
        packed0 = color.bgr_to_packed_exact(bgr)
        labq = color.unpack_labf(packed0)
    else:
        lab = color.bgr_to_labf(bgr)
        labq = color.quantize_labf(lab)      # = unpack(pack(lab)) centers
        packed0 = color.pack_lab(lab)
    labb = jnp.stack([blur.gaussian_blur(labq[..., c], cfg.blur_radius)
                      for c in range(3)], axis=-1)
    import jax

    if jax.default_backend() == "tpu":
        # fused Pallas gradient stage (ops/pallas_grad.py): edgevec +
        # quantize + edge_lab in one VMEM pass
        em, vec = edge_front_pallas(labb, bh=cfg.grad_bh)
    else:
        vec = gradient.edgevec(labb[..., 0])
        # edge operates on the re-packed blurred image (oclrect.c:257)
        labb_q = color.quantize_labf(labb)
        em = gradient.edge_lab(labb_q)
    edge_thin = thin.thinthres(em, vec, bh=cfg.thin_bh)
    edge_bin = (edge_thin > 0).astype(jnp.int32)
    return EdgeFrontend(packed0, labb, edge_thin, edge_bin)
