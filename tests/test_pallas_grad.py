"""Fused Pallas gradient-stage kernel vs the XLA formulation.

Same FMA-contraction tolerance contract as tests/test_pallas_thin.py; the
normalize fallback and channel clamping are knife-edge-free on generic
float inputs, so agreement here is plain allclose.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rectdetect_tpu.core import color
from rectdetect_tpu.ops import gradient
from rectdetect_tpu.ops.pallas_grad import edge_front_pallas


def _labb(h=40, w=56, seed=5):
    r = np.random.default_rng(seed)
    img = r.integers(0, 256, (h, w, 3), np.uint8)
    img[h // 4:3 * h // 4, w // 4:3 * w // 4] = (200, 80, 40)
    lab = color.bgr_to_labf(jnp.asarray(img))
    return jnp.asarray(np.asarray(lab))     # any smooth (H,W,3) in [0,1)


def _want(labb):
    vec = gradient.edgevec(labb[..., 0])
    em = gradient.edge_lab(color.quantize_labf(labb))
    return np.asarray(em), np.asarray(vec)


def _check(labb, bh=16):
    em_w, vec_w = _want(labb)
    em_g, vec_g = edge_front_pallas(labb, bh=bh)
    np.testing.assert_allclose(np.asarray(em_g), em_w, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vec_g), vec_w, atol=2e-4)


def test_pallas_grad_matches_xla():
    _check(_labb())


def test_pallas_grad_odd_size():
    _check(_labb(h=37, w=45, seed=7))


def test_pallas_grad_vmap():
    labbs = jnp.stack([_labb(seed=s) for s in (1, 2)])
    em_g, vec_g = jax.vmap(lambda x: edge_front_pallas(x, bh=16))(labbs)
    for b in range(2):
        em_w, vec_w = _want(labbs[b])
        np.testing.assert_allclose(np.asarray(em_g[b]), em_w, atol=2e-4)
        np.testing.assert_allclose(np.asarray(vec_g[b]), vec_w, atol=2e-4)
