import numpy as np
import jax.numpy as jnp

from golden import imgutil as G
from rectdetect_tpu.core import color as C
from rectdetect_tpu.ops import blur as B
from rectdetect_tpu.ops import gradient as GR
from rectdetect_tpu.ops import thin as T


def _labf(scene):
    return G.bgr_to_labf(scene).astype(np.float32)


def test_gaussian_taps_normalized():
    # tabulated radii reproduce the reference recurrence, including its
    # own slight gain error (r=1 sums to 1.00031 on the device too)
    for r in (1, 2):
        assert abs(sum(B.gaussian_taps(r)) - 1.0) < 5e-4
    # sampled radii are exactly normalized
    for r in (3, 8, 32):
        assert abs(sum(B.gaussian_taps(r)) - 1.0) < 1e-12
    # the r=2 peak is the reference's iircoef[2][0] = 1/sqrt(2*pi)
    # (the kernel's zero-based indexing selects the sigma~1 row)
    assert abs(max(B.gaussian_taps(2)) - 0.3989422804) < 1e-7


def test_gaussian_blur_constant_preserved():
    img = jnp.full((32, 40), 0.37, jnp.float32)
    out = np.asarray(B.gaussian_blur(img, 2))
    np.testing.assert_allclose(out, 0.37, atol=1e-6)


def test_gaussian_blur_matches_scipy(scene):
    from scipy.ndimage import correlate1d
    lab = _labf(scene)[..., 0]
    got = np.asarray(B.gaussian_blur(jnp.asarray(lab), 2))
    taps = np.asarray(B.gaussian_taps(2))
    want = correlate1d(lab.astype(np.float64), taps, axis=1, mode="mirror")
    want = correlate1d(want, taps, axis=0, mode="mirror")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_blur_iir_close_to_fir():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((40, 48)), jnp.float32)
    fir = np.asarray(B.gaussian_blur(img, 9))       # sigma = 3
    iir = np.asarray(B.gaussian_blur_iir(img, 3.0))
    # interior agreement (IIR has different boundary handling)
    np.testing.assert_allclose(fir[12:-12, 12:-12], iir[12:-12, 12:-12],
                               atol=2e-2)


def test_edgevec_matches_golden(scene):
    lab = _labf(scene)[..., 0]
    got = np.asarray(GR.edgevec(jnp.asarray(lab)))
    want = G.edgevec(lab)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_edgevec_lab_matches_golden(scene):
    lab = _labf(scene)
    got = np.asarray(GR.edgevec_lab(jnp.asarray(lab)))
    want = G.edgevec_lab(lab)
    # unit vectors: compare dot products to tolerate sign-flip knife-edges
    dot = (got * want).sum(-1)
    assert (dot > 0.999).mean() > 0.995


def test_edge_matches_golden(scene):
    lab = _labf(scene)[..., 0]
    got = np.asarray(GR.edge(jnp.asarray(lab)))
    np.testing.assert_allclose(got, G.edge(lab), atol=2e-4)


def test_edge_lab_matches_golden(scene):
    lab = _labf(scene)
    got = np.asarray(GR.edge_lab(jnp.asarray(lab)))
    np.testing.assert_allclose(got, G.edge_lab(lab), atol=2e-4)


def test_bicubic_sample_matches_golden(scene):
    """Bit-exact: the build evaluates the reference's bicubicSub Horner
    sequence on the same f32-rounded absolute positions."""
    lab = _labf(scene)[..., 0]
    vec = G.edgevec(lab).astype(np.float32)
    for k in (-2.0, -1.0, 1.0, 2.0):
        got = np.asarray(T.bicubic_sample_along(
            jnp.asarray(lab), jnp.asarray(vec[..., 0]), jnp.asarray(vec[..., 1]), k))
        want = np.zeros_like(lab, dtype=np.float32)
        for y in range(lab.shape[0]):
            for x in range(lab.shape[1]):
                want[y, x] = G.bicubic(lab,
                                       np.float32(x + k * vec[y, x, 0]),
                                       np.float32(y + k * vec[y, x, 1]))
        np.testing.assert_array_equal(got, want)


def test_thinthres_matches_golden(scene):
    """Bit-exact incl. the knife-edge keep predicate (plateau ties resolve
    exactly like the reference's bicubicSub, which returns p1 exactly on
    flat input — the round-2 A/B under-detection asymmetry)."""
    lab = _labf(scene)
    e = G.edge_lab(lab).astype(np.float32)
    vec = G.edgevec(lab[..., 0]).astype(np.float32)
    got = np.asarray(T.thinthres(jnp.asarray(e), jnp.asarray(vec)))
    want = G.thinthres(e, vec).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_fir_blur_matches_reference_iir_recurrence():
    """ops/blur.gaussian_blur(r=2) vs the loop-level transcription of the
    reference's 8-FF/7-FB recurrence + iircoef[2] (golden.imgutil.iirblur,
    oclimgutil.cl:542-637, :900-1125).  Bounds the substitution at the
    response level: <= 1.5e-3 absolute on unit-scale inputs (measured
    5.4e-4 max on random fields), restoring the golden-oracle invariant
    for the blur stage."""
    import numpy as np
    import jax.numpy as jnp
    import golden.imgutil as G
    from rectdetect_tpu.ops import blur

    rng = np.random.default_rng(7)
    img = rng.random((60, 76)).astype(np.float32)
    ours = np.asarray(blur.gaussian_blur(jnp.asarray(img), 2))
    ref = G.iirblur(img, 2)
    # taps are now the recurrence's exact impulse response: f32 noise
    assert np.abs(ours - ref).max() <= 2e-6

    # impulse response: same mass and peak within the same bound
    imp = np.zeros((41, 41), np.float32)
    imp[20, 20] = 1.0
    oi = np.asarray(blur.gaussian_blur(jnp.asarray(imp), 2))
    ri = G.iirblur(imp, 2)
    assert abs(oi.sum() - ri.sum()) <= 2e-6
    assert np.abs(oi - ri).max() <= 2e-6
