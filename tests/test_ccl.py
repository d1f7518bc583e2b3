import numpy as np
import jax.numpy as jnp

from golden import labeling as G
from rectdetect_tpu.ops import ccl as C
from rectdetect_tpu.ops import morphology as M


def _spiral(h=24, w=24):
    """Adversarial worst case for label propagation: one long spiral."""
    img = np.zeros((h, w), np.int32)
    top, bot, left, right = 0, h - 1, 0, w - 1
    while top <= bot and left <= right:
        img[top, left:right + 1] = 1
        img[top:bot + 1, right] = 1
        img[bot, left:right + 1] = 1
        img[top:bot + 1, left] = 1
        top += 3
        bot -= 3
        left += 3
        right -= 3
    return img


def _random_blobs(h=32, w=40, seed=3):
    r = np.random.default_rng(seed)
    return (r.random((h, w)) < 0.55).astype(np.int32)


def test_ccl_matches_union_find_blobs():
    pix = _random_blobs()
    got = np.asarray(C.label_components(jnp.asarray(pix), 0, 10, 6))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_ccl_multivalue():
    r = np.random.default_rng(5)
    pix = r.integers(0, 3, (28, 36)).astype(np.int32)
    got = np.asarray(C.label_components(jnp.asarray(pix), 0, 10, 6))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_ccl_spiral_converged():
    pix = _spiral()
    got = np.asarray(C.label_components_converged(jnp.asarray(pix), 0))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_ccl_fixed_passes_spiral():
    # 10 passes with 6-jump compression handles a 24x24 spiral (the
    # reference relies on the same budget, oclimgutil.c:229)
    pix = _spiral()
    got = np.asarray(C.label_components(jnp.asarray(pix), 0, 10, 6))
    want = G.label_components(pix, 0)
    np.testing.assert_array_equal(got, want)


def test_strength_filter(scene):
    from golden import imgutil as GI
    lab = GI.bgr_to_labf(scene)
    e = GI.edge_lab(lab).astype(np.float32)
    binary = (e > 0.05).astype(np.int32)
    lbl = np.asarray(C.label_components(jnp.asarray(binary), 0, 10, 6))
    st_got = np.asarray(C.calc_strength(jnp.asarray(e), jnp.asarray(lbl)))
    st_want = G.calc_strength(e.astype(np.float64), lbl)
    # per-pixel int truncation in f32 vs f64 can differ by 1 per pixel
    nz = st_want > 0
    assert np.all(np.abs(st_got[: len(st_want)][nz] - st_want[nz]) <=
                  np.maximum(5, 0.01 * st_want[nz]))
    fl_got = np.asarray(C.filter_strength(jnp.asarray(lbl),
                                          jnp.asarray(st_got), 500))
    fl_want = G.filter_strength(lbl, st_got, 500)
    np.testing.assert_array_equal(fl_got, fl_want)


def test_component_sizes():
    pix = _random_blobs(20, 24)
    lbl = np.asarray(C.label_components(jnp.asarray(pix), 0, 10, 6))
    lbl0 = np.where(lbl < 0, 0, lbl)  # polyline convention: bg label 0
    sizes = np.asarray(C.component_sizes(jnp.asarray(lbl0)))
    want = np.bincount(lbl0.reshape(-1), minlength=lbl0.size)
    want[0] = 0
    np.testing.assert_array_equal(sizes, want[: len(sizes)])


def test_morphology_matches_golden(scene):
    from golden import imgutil as GI
    lab = GI.bgr_to_labf(scene)
    e = GI.edge_lab(lab)
    binary = (e > 0.05).astype(np.int32)
    j_got = np.asarray(M.simple_junction(jnp.asarray(binary)))
    j_want = G.simple_junction(binary)
    np.testing.assert_array_equal(j_got, j_want)

    c_got = np.asarray(M.simple_connect_poly(jnp.asarray(j_want.astype(np.int32))))
    c_want = G.simple_connect_poly(j_want)
    np.testing.assert_array_equal(c_got, c_want)

    s_got = np.asarray(M.stringify(jnp.asarray(c_want.astype(np.int32)), 0))
    s_want = G.stringify(c_want, 0)
    np.testing.assert_array_equal(s_got, s_want)
    s2_got = np.asarray(M.stringify(jnp.asarray(s_want.astype(np.int32)), 1))
    s2_want = G.stringify(s_want, 1)
    np.testing.assert_array_equal(s2_got, s2_want)

    r_got = np.asarray(M.remove_branch(jnp.asarray(s2_want.astype(np.int32))))
    r_want = G.remove_branch(s2_want)
    np.testing.assert_array_equal(r_got, r_want)


def test_junction_positive_only():
    img = np.array([[0, 0, 0, 0],
                    [0, -1, 2, 0],
                    [0, 3, 0, 0],
                    [0, 0, 0, 0]], np.int32)
    got = np.asarray(M.simple_junction(jnp.asarray(img), positive_only=True))
    want = G.simple_junction(img, positive_only=True)
    np.testing.assert_array_equal(got, want)


def test_convergence_margin_adversarial():
    """Pins the empirical convergence bound behind the config defaults
    (ccl_passes=8, ccl_jumps=2 with scan flood): 45%-density noise and a
    spiral must reach the exact converged fixpoint."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.config import DEFAULT_CONFIG as cfg
    from rectdetect_tpu.ops.ccl import (label_components,
                                        label_components_converged)

    r = np.random.default_rng(7)
    cases = [(r.random((180, 320)) < 0.45).astype(np.int32)]
    sp = np.zeros((160, 160), np.int32)
    x0 = y0 = 2
    x1 = y1 = 157
    while x1 - x0 > 4:
        sp[y0, x0:x1] = 1
        sp[y0:y1, x1] = 1
        sp[y1, x0 + 3:x1 + 1] = 1
        sp[y0 + 3:y1 + 1, x0 + 3] = 1
        x0 += 6; y0 += 6; x1 -= 6; y1 -= 6
    cases.append(sp)

    for img in cases:
        ref = np.asarray(label_components_converged(jnp.asarray(img), 0))
        got = np.asarray(label_components(
            jnp.asarray(img), 0, cfg.ccl_passes, cfg.ccl_jumps,
            sparse_cap=img.size, scan_boost=True))
        np.testing.assert_array_equal(got, ref)


def test_label_components_adaptive_both_branches():
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops.ccl import (label_components,
                                        label_components_adaptive)
    r = np.random.default_rng(9)
    for density in (0.02, 0.4):          # small branch / big branch
        img = (r.random((48, 64)) < density).astype(np.int32)
        ref = np.asarray(label_components(jnp.asarray(img), 0, 8, 2,
                                          scan_boost=True,
                                          sparse_cap=img.size))
        got = np.asarray(label_components_adaptive(
            jnp.asarray(img), 0, 8, 2, small_cap=256,
            big_cap=img.size))
        np.testing.assert_array_equal(got, ref)


def test_strength_filter_pair_matches_staged():
    """Fused calc+both-filters == the staged composition, including the
    strong-from-weak chaining (thre_strong >= thre_weak makes them
    interchangeable) and border-keep semantics."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops import ccl
    from rectdetect_tpu.ops.compact import compact_mask

    r = np.random.default_rng(9)
    h, w = 48, 64
    strings = (r.random((h, w)) < 0.3).astype(np.int32)
    edge = (r.random((h, w)) * 0.6).astype(np.float32) * strings
    lbl = ccl.label_components(jnp.asarray(strings), 0, 8, 4)
    comp = compact_mask((jnp.asarray(strings) != 0).reshape(-1),
                        h * w // 2)
    st = ccl.calc_strength(jnp.asarray(edge), lbl, 10000.0, comp=comp)
    weak = ccl.filter_strength(lbl, st, 500, comp=comp)
    strong = ccl.filter_strength(weak, st, 2500, comp=comp)
    fw, fs, fst = ccl.strength_filter_pair(jnp.asarray(edge), lbl, comp,
                                           500, 2500)
    np.testing.assert_array_equal(np.asarray(fw), np.asarray(weak))
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(strong))
    np.testing.assert_array_equal(np.asarray(fst), np.asarray(st))


def test_strength_filter_pair_total_overflow_safe():
    """The sorted-path run fill must survive a frame whose TOTAL strength
    exceeds int32 even though every per-component sum fits (ADVICE r3):
    per-pixel contributions ~1e6 over 3k pixels push the global cumsum
    past 2^31; decisions must still match the staged scatter-add path
    (which only needs per-component int32 fit)."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops import ccl
    from rectdetect_tpu.ops.compact import compact_mask

    r = np.random.default_rng(11)
    h, w = 48, 64
    strings = (r.random((h, w)) < 0.6).astype(np.int32)
    # edge ~ 10..12 -> val ~ 1.0-1.4e6/px; frame total ~ 2-3e9 > 2^31
    edge = (10.0 + 2.0 * r.random((h, w))).astype(np.float32) * strings
    lbl = ccl.label_components(jnp.asarray(strings), 0, 8, 4)
    comp = compact_mask((jnp.asarray(strings) != 0).reshape(-1), h * w)
    total = float(np.sum((np.asarray(edge).ravel() ** 2 *
                          10000.0).astype(np.int64)))
    assert total > 2 ** 31          # the scene actually wraps int32
    st = ccl.calc_strength(jnp.asarray(edge), lbl, 10000.0, comp=comp)
    weak = ccl.filter_strength(lbl, st, 500, comp=comp)
    strong = ccl.filter_strength(weak, st, 2500, comp=comp)
    fw, fs, _ = ccl.strength_filter_pair(jnp.asarray(edge), lbl, comp,
                                         500, 2500)
    np.testing.assert_array_equal(np.asarray(fw), np.asarray(weak))
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(strong))


def test_strength_filter_pair_gather_fill_branch():
    """Force the index-gather fill (S * thre_max >= 2^31) with huge
    thresholds on a small list and check it still matches the staged
    path bit-exactly."""
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.ops import ccl
    from rectdetect_tpu.ops.compact import compact_mask

    r = np.random.default_rng(12)
    h, w = 48, 64
    strings = (r.random((h, w)) < 0.3).astype(np.int32)
    edge = (r.random((h, w)) * 40.0).astype(np.float32) * strings
    lbl = ccl.label_components(jnp.asarray(strings), 0, 8, 4)
    comp = compact_mask((jnp.asarray(strings) != 0).reshape(-1),
                        h * w // 2)
    S = h * w // 2
    thre_w = 2 ** 31 // S + 1       # forces the gather branch
    thre_s = 2 * thre_w
    assert S * max(thre_w, thre_s) >= 2 ** 31
    st = ccl.calc_strength(jnp.asarray(edge), lbl, 10000.0, comp=comp)
    weak = ccl.filter_strength(lbl, st, thre_w, comp=comp)
    strong = ccl.filter_strength(weak, st, thre_s, comp=comp)
    fw, fs, _ = ccl.strength_filter_pair(jnp.asarray(edge), lbl, comp,
                                         thre_w, thre_s)
    np.testing.assert_array_equal(np.asarray(fw), np.asarray(weak))
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(strong))
