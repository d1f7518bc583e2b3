"""Robustness invariants: odd/non-aligned sizes, degenerate inputs, blur
radius range (the verify-skill checklist as regression tests)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from rectdetect_tpu.core import color
from rectdetect_tpu.ops import blur, gradient, thin
from rectdetect_tpu.pipeline.rect import rect_frame, live_rects
from rectdetect_tpu.pipeline.poly import poly_frame

TAN = math.tan(math.radians(72) / 2)


def test_color_roundtrip_mean_error():
    r = np.random.default_rng(0)
    bgr = r.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    lab = color.quantize_labf(color.bgr_to_labf(jnp.asarray(bgr)))
    back = np.asarray(color.labf_to_bgr(lab)).astype(np.float64)
    err = np.abs(back - bgr).mean()
    assert err < 1.0, err


def test_odd_sizes_all_finite():
    r = np.random.default_rng(1)
    bgr = r.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    lab = color.bgr_to_labf(jnp.asarray(bgr))
    bl = blur.gaussian_blur(lab[..., 0], 2)
    v = gradient.edgevec(bl)
    em = gradient.edge_lab(jnp.stack([bl] * 3, -1))
    t = thin.thinthres(em, v)
    for x in (bl, v, em, t):
        assert np.isfinite(np.asarray(x)).all()


def test_all_black_frame_no_detections():
    bgr = jnp.zeros((48, 64, 3), jnp.uint8)
    res = rect_frame(bgr, TAN)
    assert len(live_rects(res)) == 0
    arena, _ = poly_frame(bgr)
    assert int(arena.count) == 0


def test_constant_frame_no_detections():
    bgr = jnp.full((48, 64, 3), 128, jnp.uint8)
    res = rect_frame(bgr, TAN)
    assert len(live_rects(res)) == 0


@pytest.mark.parametrize("r", [1, 4, 16, 32])
def test_blur_radius_range_finite_and_normalized(r):
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((40, 56)).astype(np.float32))
    out = np.asarray(blur.gaussian_blur(img, r))
    assert np.isfinite(out).all()
    # a blur preserves a constant image up to its DC gain squared (two
    # axis passes; the reference's own tabulated rows carry up to
    # ~3e-4 1D gain error, so 2D is ~6e-4 — device-faithful)
    const = np.asarray(blur.gaussian_blur(jnp.ones((40, 56)), r))
    np.testing.assert_allclose(const, 1.0, atol=1e-3)


def test_iir_blur_matches_fir_closely():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((64, 96)).astype(np.float32))
    a = np.asarray(blur.gaussian_blur(img, 12))
    b = np.asarray(blur.gaussian_blur_iir(img, 4.0))
    # interior agreement (borders differ: reflect vs zero-phase IIR tail)
    np.testing.assert_allclose(a[16:-16, 16:-16], b[16:-16, 16:-16],
                               atol=0.02)


def test_tiny_frame():
    bgr = jnp.zeros((16, 16, 3), jnp.uint8)
    res = rect_frame(bgr, TAN)
    assert np.asarray(res.valid).sum() == 0
