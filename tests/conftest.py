"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; all sharding tests use
xla_force_host_platform_device_count per the build plan (SURVEY.md §7).
Must set env before jax imports.
"""

import os
import sys

# The container boot hook (sitecustomize) registers a remote-TPU "axon"
# platform and forces jax_platforms=axon, overriding the JAX_PLATFORMS env
# var.  Tests must run on local CPU with 8 virtual devices, so flip the
# config back before any backend is initialized (conftest is imported before
# any test module imports jax for real work).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Tests that exercise the apps enable the persistent compilation cache;
# point it at a throwaway dir so test runs neither pollute nor contend
# with the real per-user cache (concurrent writers have produced
# serialization segfaults).
import tempfile  # noqa: E402

os.environ.setdefault("RECTDETECT_CACHE",
                      tempfile.mkdtemp(prefix="rectdetect_test_cache_"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


_TESTS_SEEN = 0


@pytest.fixture(autouse=True)
def _recycle_xla_cpu_compiler():
    """XLA:CPU segfaults deterministically after ~90 accumulated
    compiles in one process (see CLAUDE.md) — the reason the suite
    requires xdist process sharding and has still lost workers as the
    suite grew (round-3 verdict).  Dropping the jit caches every few
    tests releases the compiled executables (and with them the CPU
    client state that accumulates toward the crash) at a small
    recompile cost for session-scoped fixtures."""
    global _TESTS_SEEN
    yield
    _TESTS_SEEN += 1
    if _TESTS_SEEN % 12 == 0:
        jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def synth_scene(h=32, w=44, seed=0):
    """Small synthetic BGR scene with a couple of quads and gradients."""
    r = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.uint8)
    img[:] = (40, 90, 120)
    yy, xx = np.mgrid[0:h, 0:w]
    img[..., 1] = (img[..., 1] + (xx * 255 // w) // 4).astype(np.uint8)
    # axis-aligned rectangle
    img[h // 6:h // 2, w // 8:w // 2] = (200, 60, 50)
    # tilted quad via half-plane tests
    c0 = (xx - yy * 0.5 > w * 0.55) & (xx - yy * 0.5 < w * 0.9)
    c1 = (yy + 0.2 * xx > h * 0.3) & (yy + 0.2 * xx < h * 0.85)
    img[c0 & c1] = (60, 180, 220)
    noise = r.integers(0, 6, size=img.shape, dtype=np.uint8)
    return (img.astype(np.int32) + noise).clip(0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def scene():
    return synth_scene()
