"""Pallas kernels vs their XLA formulations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from rectdetect_tpu.ops import regions
from rectdetect_tpu.ops.pallas_blblur import blblur_pallas
from tests.test_regions import make_scene


def test_pallas_blblur_bit_exact():
    packed, edge = make_scene()
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.int32))
    a = np.asarray(regions.blblur(p, e, 3))
    b = np.asarray(blblur_pallas(p, e, 3))
    np.testing.assert_array_equal(a, b)


def test_pallas_blblur_full_iters():
    packed, edge = make_scene(h=36, w=48)
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.int32))
    a = np.asarray(regions.blblur(p, e, 10))
    b = np.asarray(blblur_pallas(p, e, 10))
    np.testing.assert_array_equal(a, b)


def test_pallas_blblur_blocked_bit_exact():
    from rectdetect_tpu.ops.pallas_blblur import blblur_pallas_blocked
    packed, edge = make_scene(h=40, w=48)
    p = jnp.asarray(packed.astype(np.int32))
    e = jnp.asarray(edge.astype(np.int32))
    a = np.asarray(regions.blblur(p, e, 10))
    b = np.asarray(blblur_pallas_blocked(p, e, 10, block=16))
    np.testing.assert_array_equal(a, b)
