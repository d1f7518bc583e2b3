"""rectdetect_tpu — TPU-native realtime rectangle detection.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the OpenCL
reference `shibatch/rectdetect` (see SURVEY.md): packed-CIELAB conversion,
Gaussian blur, oriented edge extraction + non-max-suppression thinning,
connected-component labeling, polyline vectorization, edge-preserving region
segmentation, and perspective-aware quad fitting with 3D pose estimation —
implemented as fully on-chip, statically-shaped XLA programs over
HBM-resident frame tensors.

The design is TPU-first, not a port:
  * atomics            -> segment reductions / scatter-min-max
  * dynamic lists      -> fixed-capacity arenas + prefix-sum allocation
  * sequential tracing -> pointer-jumping with gathers at fixed trip counts
  * CPU geometry stage -> batched, vmapped on-chip hull/clip/pose
  * device selection   -> jax.sharding.Mesh over streams and frame tiles
"""

__version__ = "0.1.0"

from rectdetect_tpu.config import PipelineConfig  # noqa: F401
