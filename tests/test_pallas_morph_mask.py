"""Fused junction+merge_mask Pallas kernel vs the XLA composition
(bit-exact: all integer/boolean ops)."""

import numpy as np
import jax.numpy as jnp

from rectdetect_tpu.ops import morphology, regions
from rectdetect_tpu.ops.pallas_morph import merge_mask_pallas


def _want(sl):
    jn = morphology.simple_junction(jnp.asarray(sl), positive_only=True)
    return np.asarray(regions.merge_mask(jn))


def _strong(h, w, seed=0, p=0.08):
    r = np.random.default_rng(seed)
    sl = (r.random((h, w)) < p).astype(np.int32)
    sl[h // 3, 5:w - 5] = 1                  # a long line (ends -> jn==2)
    sl[5:h - 5, w // 3] = 1                  # a crossing (core -> jn>2)
    return sl * (r.integers(1, 1000, (h, w)).astype(np.int32))


def test_merge_mask_pallas_bit_exact():
    sl = _strong(96, 160, seed=3)
    got = np.asarray(merge_mask_pallas(jnp.asarray(sl), bh=32))
    np.testing.assert_array_equal(_want(sl), got)


def test_merge_mask_pallas_odd_size():
    sl = _strong(75, 133, seed=9)
    got = np.asarray(merge_mask_pallas(jnp.asarray(sl), bh=32))
    np.testing.assert_array_equal(_want(sl), got)


def test_merge_mask_pallas_negative_labels():
    # positive_only: labels can be -1 (oclrect.cl:74-95)
    sl = _strong(64, 128, seed=5)
    sl[sl == 0] = -1
    got = np.asarray(merge_mask_pallas(jnp.asarray(sl), bh=32))
    np.testing.assert_array_equal(_want(sl), got)
