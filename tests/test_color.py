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


def test_lut_generators_spot_values():
    """The regenerated fixed-point tables must hit the reference's
    embedded values (spot set verified against oclimgutil.cl:661-898)."""
    from rectdetect_tpu.core.luts import (cfunc2_table, cfunc_table,
                                          s2l_table)
    s2l, cfunc, cfunc2 = s2l_table(), cfunc_table(), cfunc2_table()
    assert s2l.shape == (261,) and cfunc.shape == (1031,) \
        and cfunc2.shape == (1031,)
    assert [int(s2l[i]) for i in (0, 1, 16, 100, 255, 260)] == \
        [0, 9, 169, 4175, 32768, 34248]
    assert [int(cfunc[i]) for i in (0, 1, 16, 100, 255, 1024)] == \
        [0, 499, 7345, 21141, 32192, 56497]
    assert [int(cfunc2[i]) for i in (0, 1, 16, 100, 255, 1023)] == \
        [0, 453, 6682, 19233, 29288, 51381]
    assert np.all(np.diff(s2l) >= 0) and np.all(np.diff(cfunc) >= 0)


def test_exact_packed_matches_golden():
    from golden.imgutil import srgb2plab_exact
    r = np.random.default_rng(11)
    bgr = r.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    gold = srgb2plab_exact(bgr)
    got = np.asarray(C.bgr_to_packed_exact(jnp.asarray(bgr)))
    np.testing.assert_array_equal(got, gold)
    # extremes
    for v in (0, 255):
        one = np.full((2, 2, 3), v, np.uint8)
        np.testing.assert_array_equal(
            np.asarray(C.bgr_to_packed_exact(jnp.asarray(one))),
            srgb2plab_exact(one))


def test_exact_packed_close_to_closed_form():
    """The closed-form production path sits on the same lattice within
    the documented <=0.4% scale deviation (docs/STATUS.md)."""
    r = np.random.default_rng(3)
    bgr = jnp.asarray(r.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    exact = C.unpack_labf(C.bgr_to_packed_exact(bgr))
    closed = C.unpack_labf(C.pack_lab(C.bgr_to_labf(bgr)))
    d = np.abs(np.asarray(exact) - np.asarray(closed))
    assert d.max() < 0.008          # lattice quantum 1/1024 + 0.4% scale


def test_color_exact_pipeline_detects():
    """color_exact mode runs the full pipeline end to end and still
    finds the synthetic quad (geometry within a pixel of default mode)."""
    import dataclasses
    import math
    from rectdetect_tpu.config import DEFAULT_CONFIG
    from rectdetect_tpu.pipeline import rect as prect

    r = np.random.default_rng(5)
    bgr = np.full((96, 128, 3), 70, np.uint8)
    bgr[20:70, 30:100] = (180, 160, 60)
    bgr = (bgr.astype(np.int16)
           + r.integers(-3, 4, bgr.shape, dtype=np.int16)).clip(
               0, 255).astype(np.uint8)
    tan = math.tan(math.radians(72) / 2)
    cfg_x = dataclasses.replace(DEFAULT_CONFIG, color_exact=True)
    got = prect.live_rects(prect.rect_frame(jnp.asarray(bgr), tan, cfg_x))
    ref = prect.live_rects(prect.rect_frame(jnp.asarray(bgr), tan))
    assert got and ref
    a = np.sort(np.asarray(got[0]["c2"]), axis=0)
    b = np.sort(np.asarray(ref[0]["c2"]), axis=0)
    np.testing.assert_allclose(a, b, atol=1.5)


def test_l2s_table_spot_values():
    """l2s = clamp(round(linear_to_srgb(i/1023)*256), 0, 255): spot
    entries, monotonicity, and closed-form agreement within 1."""
    import jax.numpy as jnp
    from rectdetect_tpu.core.luts import l2s_table
    from rectdetect_tpu.core import color

    t = l2s_table()
    assert t.shape == (1024,)
    assert [int(t[i]) for i in (0, 1, 2, 3, 4, 16, 1023)] == \
        [0, 3, 6, 10, 13, 34, 255]
    assert np.all(np.diff(t) >= 0) and t.dtype == np.int32
    # the LUT path floor-indexes a 1024 grid, so vs closed-form rounding
    # it is off by the encoding's slope per grid cell: <= 1 byte once
    # the gamma curve flattens (lin >= ~0.023), up to ~3.2 bytes inside
    # the 12.92 toe — the reference kernel's own quantization, not ours
    lin = jnp.linspace(0.0, 1.0, 4097)
    a = np.asarray(color.linear_to_srgb_exact(lin))
    b = np.asarray(color.linear_to_srgb(lin))
    d = np.abs(a - b)
    # (the table's /1023 grid vs the kernel's /1024 floor-index adds a
    # one-cell skew on top of rounding)
    assert np.max(d[np.asarray(lin) >= 0.05]) <= 2
    assert np.max(d) <= 4
    # round trip byte -> linear -> l2s: the reference's table pair is
    # NOT mutually inverse (256-vs-255 scale, /1023-vs-/1024 grid), so
    # its own roundtrip carries a ~1-byte bias (3 in the toe) — ours
    # must reproduce exactly that, not be "better"
    u8 = jnp.arange(256, dtype=jnp.uint8)
    rt = np.asarray(color.linear_to_srgb_exact(color.srgb_to_linear(u8)))
    d_rt = np.abs(rt - np.arange(256))
    assert np.max(d_rt) <= 3 and np.max(d_rt[24:]) <= 1
