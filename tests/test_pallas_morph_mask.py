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


def test_distinct_bids_pallas_bit_exact():
    from rectdetect_tpu.ops.reduce_ls import _distinct_bids
    from rectdetect_tpu.ops.pallas_morph import distinct_bids_pallas
    r = np.random.default_rng(13)
    # blocky boundary-id map with -1 background (flat-index-like ids)
    b = np.full((70, 150), -1, np.int32)
    for _ in range(25):
        y, x = r.integers(0, 64), r.integers(0, 140)
        b[y:y + r.integers(1, 6), x:x + r.integers(1, 9)] = y * 150 + x + 1
    want = _distinct_bids(jnp.asarray(b), 4)
    got = distinct_bids_pallas(jnp.asarray(b), bh=24)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(want[i]),
                                      np.asarray(got[i]), err_msg=f"slot {i}")


def test_merge_mask_pallas_offset_form():
    """The width-tile offset form: only the junction interior test moves
    to global coords; must equal the offset jnp composition."""
    import jax.numpy as jnp
    import numpy as np
    from rectdetect_tpu.ops import morphology, regions
    from rectdetect_tpu.ops.pallas_morph import merge_mask_pallas
    r = np.random.default_rng(5)
    lbl = jnp.asarray(r.integers(-1, 40, (36, 44)).astype(np.int32))
    x0, wt = jnp.int32(20), 128
    a = np.asarray(regions.merge_mask(morphology.simple_junction(
        lbl, positive_only=True, x0=x0, w_total=wt)))
    b = np.asarray(merge_mask_pallas(lbl, x0=x0, w_total=wt))
    np.testing.assert_array_equal(a, b)
