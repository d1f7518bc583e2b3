"""Golden (NumPy, loop-level) reference model of every pipeline stage.

These implementations mirror the *semantics* of the OpenCL reference
kernel-by-kernel (citations per function) in the most literal way possible —
scalar loops, per-pixel branches — so they serve as the oracle for the
vectorized TPU kernels.  They are intentionally slow; tests use small images.
"""
