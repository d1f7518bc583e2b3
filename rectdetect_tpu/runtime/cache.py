"""Persistent compilation / calibration cache.

The reference persists its autotune results per device in plan.txt
(oclhelper.c:394-527) so later runs skip the profiling pass.  The XLA
analog is the persistent compilation cache: the rect pipeline is one big
XLA program whose compile takes minutes at 720p, so caching it across
processes is the difference between instant start and a long warmup.
Calibration-style knobs (halo sizes, arena capacities) live in the
plan-cache file via runtime.native.plan_load/save."""

from __future__ import annotations

import os
import pathlib

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache",
                        "rectdetect_tpu", "xla")
_enabled = False


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently enable the JAX persistent compilation cache.

    TPU only: that is where compiles take minutes; CPU compiles are fast
    and serializing some large CPU executables has segfaulted
    (jax 0.8 put_executable_and_time)."""
    global _enabled
    import jax
    p = path or os.environ.get("RECTDETECT_CACHE", _DEFAULT)
    if jax.default_backend() not in ("tpu",):
        return p
    pathlib.Path(p).mkdir(parents=True, exist_ok=True)
    if not _enabled:
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return p
