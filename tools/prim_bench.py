"""Microbenchmark the slot/table primitives the pipeline is built on.

Measures, on the live backend with the amortized single-readback protocol:
  * random-row gather at various row counts (the docs/SOL.md constant)
  * scatter-set / scatter-add at various UPDATE-row counts (incl. the
    mostly-dropped full-frame pattern compact_mask uses)
  * full-frame cumsum (i32)
  * full-frame sort (i32 keys) and argsort-style key-value sort
  * compact_mask end-to-end vs a sort-based compaction

Usage: python tools/prim_bench.py [N_ITERS]
"""

from __future__ import annotations

import sys
import time
import functools

import numpy as np


def timeit(fn, args, n=32):
    import jax
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()

    n_it = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = 921600
    rng = np.random.default_rng(0)
    table = jax.device_put(rng.integers(0, 1 << 20, (n,), np.int32))
    perm = jax.device_put(
        rng.permutation(n).astype(np.int32))
    mask28 = jax.device_put((rng.random(n) < 0.28))
    mask02 = jax.device_put((rng.random(n) < 0.02))
    vals = jax.device_put(rng.integers(0, 100, (n,), np.int32))

    print(f"platform={jax.devices()[0].platform} n={n} iters={n_it}",
          flush=True)

    def report(name, ms, rows=None):
        extra = f"  ({ms * 1e6 / rows:.2f} ns/row)" if rows else ""
        print(f"{name:42s} {ms * 1000:8.3f} ms{extra}", flush=True)

    # ---- gather: rows scale ------------------------------------------------
    for r in (16384, 92160, 307200, 921600):
        idx = jax.device_put(rng.integers(0, n, (r,), np.int32))
        f = jax.jit(lambda t, i: t[i].sum())
        report(f"gather {r} random rows", timeit(f, (table, idx), n_it), r)

    # gather rows of a packed (n,2) matrix
    packed = jnp.stack([table, table], axis=1)
    packed = jax.device_put(np.asarray(packed))
    idx = jax.device_put(rng.integers(0, n, (307200,), np.int32))
    f = jax.jit(lambda t, i: t[i].sum())
    report("gather 307200 rows of (n,2)", timeit(f, (packed, idx), n_it),
           307200)

    # ---- scatter: update-row scale ----------------------------------------
    for r in (16384, 92160, 307200, 921600):
        idx = jax.device_put(rng.integers(0, n, (r,), np.int32))
        upd = jax.device_put(rng.integers(0, 100, (r,), np.int32))
        f = jax.jit(lambda i, u: jnp.zeros((n,), jnp.int32).at[i].set(u).sum())
        report(f"scatter-set {r} rows", timeit(f, (idx, upd), n_it), r)
        f = jax.jit(lambda i, u: jnp.zeros((n,), jnp.int32).at[i].add(u).sum())
        report(f"scatter-add {r} rows", timeit(f, (idx, upd), n_it), r)

    # mostly-dropped full-frame scatter (compact_mask's allocation pattern)
    f = jax.jit(lambda m: jnp.full((307201,), n, jnp.int32).at[
        jnp.where(m & (jnp.cumsum(m.astype(jnp.int32)) - 1 < 307200),
                  jnp.cumsum(m.astype(jnp.int32)) - 1, 307200)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop").sum())
    report("compact-style scatter 921600 upd rows",
           timeit(f, (mask28,), n_it), n)

    # ---- scans -------------------------------------------------------------
    f = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)).sum())
    report("cumsum 921600 i32", timeit(f, (mask28,), n_it))

    # ---- sort --------------------------------------------------------------
    f = jax.jit(lambda t: jnp.sort(t).sum())
    report("sort 921600 i32 keys", timeit(f, (table,), n_it))
    f = jax.jit(lambda t, v: jax.lax.sort([t, v], num_keys=1)[1].sum())
    report("kv-sort 921600 i32", timeit(f, (table, vals), n_it))

    def sort_compact(m, cap):
        key = jnp.where(m, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
        return jax.lax.sort([key], num_keys=1)[0][:cap].sum()

    report("sort-compaction 28% cap=307200",
           timeit(jax.jit(functools.partial(sort_compact, cap=307200)),
                  (mask28,), n_it))
    report("sort-compaction 2% cap=57600",
           timeit(jax.jit(functools.partial(sort_compact, cap=57600)),
                  (mask02,), n_it))

    from rectdetect_tpu.ops.compact import compact_mask
    f = jax.jit(lambda m: compact_mask(m, 307200).idx.sum())
    report("compact_mask 28% cap=307200", timeit(f, (mask28,), n_it))
    f = jax.jit(lambda m: compact_mask(m, 57600).idx.sum())
    report("compact_mask 2% cap=57600", timeit(f, (mask02,), n_it))

    # top_k variant
    f = jax.jit(lambda m: jax.lax.top_k(
        jnp.where(m, -jnp.arange(n, dtype=jnp.int32), -jnp.int32(n)),
        57600)[0].sum())
    report("top_k 57600 of 921600", timeit(f, (mask02,), n_it))


if __name__ == "__main__":
    main()
