import numpy as np
import jax.numpy as jnp

from golden import imgutil as G
from rectdetect_tpu.core import color as C


def test_bgr_to_labf_matches_golden(scene):
    got = np.asarray(C.bgr_to_labf(jnp.asarray(scene)))
    want = G.bgr_to_labf(scene)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_lab_ranges(scene):
    lab = np.asarray(C.bgr_to_labf(jnp.asarray(scene)))
    assert lab[..., 0].min() >= 0.0 and lab[..., 0].max() < 0.40
    assert lab[..., 1].min() > 0.1 and lab[..., 1].max() < 0.9
    assert lab[..., 2].min() > 0.1 and lab[..., 2].max() < 0.9


def test_pack_unpack_roundtrip(scene):
    lab = C.bgr_to_labf(jnp.asarray(scene))
    q = C.quantize_labf(lab)
    packed = C.pack_lab(lab)
    unpacked = C.unpack_labf(packed)
    np.testing.assert_allclose(np.asarray(q), np.asarray(unpacked), atol=1e-7)
    # quantization is idempotent
    np.testing.assert_allclose(np.asarray(C.quantize_labf(q)), np.asarray(q),
                               atol=1e-7)
    # golden agreement: float32 vs float64 may land one quantum apart at
    # bin edges, so tolerate one a/b quantum (1/1024)
    np.testing.assert_allclose(np.asarray(q),
                               G.quantize_labf(G.bgr_to_labf(scene)),
                               atol=1.05 / 1024)


def test_pack_int_roundtrip():
    cl = jnp.asarray([0, 1, 4095, 2048])
    ca = jnp.asarray([0, 1023, 512, 7])
    cb = jnp.asarray([1023, 0, 99, 1])
    p = C.pack_lab_int(cl, ca, cb)
    l2, a2, b2 = C.unpack_lab_int(p)
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(cl))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(ca))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(cb))


def test_bgr_roundtrip_close(scene):
    lab = C.bgr_to_labf(jnp.asarray(scene))
    back = np.asarray(C.labf_to_bgr(C.quantize_labf(lab))).astype(np.int32)
    err = np.abs(back - scene.astype(np.int32))
    assert np.median(err) <= 1.0
    assert err.mean() < 2.5
