"""vmap over the Pallas kernels (interpret mode) — the batched
rect_frames path lifts every TPU-dispatched kernel through jax.vmap, so
batching must produce exactly the per-frame results."""

import numpy as np
import jax
import jax.numpy as jnp

from rectdetect_tpu.ops import pallas_ccl as P
from rectdetect_tpu.ops.pallas_morph import (morph_chain_pallas,
                                             quant_despeckle_pallas)
from tests.test_ccl import _random_blobs


def test_vmap_label_components_exact():
    pix = np.stack([_random_blobs(h=32, w=40, seed=s) for s in (1, 2, 3)])
    f = lambda p: P.label_components_exact(p, 0, bh=8)  # noqa: E731
    batched = np.asarray(jax.vmap(f)(jnp.asarray(pix)))
    for i in range(3):
        single = np.asarray(f(jnp.asarray(pix[i])))
        np.testing.assert_array_equal(batched[i], single)


def test_vmap_morph_chain():
    r = np.random.default_rng(0)
    eb = (r.random((3, 40, 48)) < 0.3).astype(np.int32)
    f = lambda e: morph_chain_pallas(e, "rect", bh=16)  # noqa: E731
    batched = np.asarray(jax.vmap(f)(jnp.asarray(eb)))
    for i in range(3):
        single = np.asarray(f(jnp.asarray(eb[i])))
        np.testing.assert_array_equal(batched[i], single)


def test_vmap_quant_despeckle():
    from tests.test_regions import make_scene
    ps, es = [], []
    for s in (0, 1):
        packed, edge = make_scene(h=40, w=48)
        ps.append(packed.astype(np.int32))
        es.append(edge.astype(np.float32) * (0.5 + s))
    p = jnp.asarray(np.stack(ps))
    e = jnp.asarray(np.stack(es))
    f = lambda a, b: quant_despeckle_pallas(a, b, bh=8)  # noqa: E731
    batched = np.asarray(jax.vmap(f)(p, e))
    for i in range(2):
        single = np.asarray(f(p[i], e[i]))
        np.testing.assert_array_equal(batched[i], single)


def test_vmap_label_merge_exact():
    r = np.random.default_rng(4)
    pix = r.integers(0, 2, (2, 24, 32)).astype(np.int32)
    mask = np.zeros_like(pix)
    elab = (r.random((2, 24, 32)) < 0.2).astype(np.int32)
    f = lambda a, b, c: P.label_merge_exact(a, b, c, bh=8)  # noqa: E731
    batched = np.asarray(jax.vmap(f)(jnp.asarray(pix), jnp.asarray(mask),
                                     jnp.asarray(elab)))
    for i in range(2):
        single = np.asarray(f(jnp.asarray(pix[i]), jnp.asarray(mask[i]),
                              jnp.asarray(elab[i])))
        np.testing.assert_array_equal(batched[i], single)
