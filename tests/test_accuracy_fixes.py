"""The two accuracy mechanisms added on top of reference parity:
2-px staircase gap bridging (morphology.simple_connect2) and the
fail-open strength-filter rescue (ccl.rescue_filtered)."""

import numpy as np
import jax.numpy as jnp

from rectdetect_tpu.ops import ccl, morphology


def _shallow_staircase(h=48, w=256, period=12):
    """A thinned shallow edge as the NMS leaves it: in-row runs with a
    straight 2-px hole at every staircase transition (the exact failure
    geometry of the seed-66 diagnosis: ...#####..#####... within one
    row, stepping rows every couple of periods)."""
    img = np.zeros((h, w), np.int32)
    y = 10
    for x in range(4, w - 4):
        if (x - 4) % period in (period - 2, period - 1):
            continue                                  # the 2-px hole
        img[y + (x // (3 * period)) % 2, x] = 1       # occasional row step
    return img


def test_connect2_closes_staircase_holes():
    img = _shallow_staircase()
    n_before = len(np.unique(np.asarray(
        ccl.label_components(jnp.asarray(img), 0, 8, 4))))
    bridged = np.asarray(morphology.simple_connect2(jnp.asarray(img)))
    lbl = np.asarray(ccl.label_components(jnp.asarray(bridged), 0, 12, 6))
    comps = np.unique(lbl[lbl >= 0])
    assert n_before > 5                 # fragmented without the bridge
    assert len(comps) == 1, len(comps)  # one chain with it
    # bridging only ADDS pixels, never removes
    assert (bridged >= img).all()


def test_connect2_ignores_wide_holes_and_junctions():
    img = np.zeros((16, 40), np.int32)
    img[8, 3:10] = 1
    img[8, 13:20] = 1        # 3-px hole: NOT bridged (beyond staircase)
    out = np.asarray(morphology.simple_connect2(jnp.asarray(img)))
    assert out[8, 10:13].sum() == 0
    # flank that is a junction (degree > 2) does not bridge
    img2 = np.zeros((16, 40), np.int32)
    img2[8, 3:10] = 1
    img2[7, 9] = 1
    img2[9, 9] = 1           # x=9 has degree 4
    img2[8, 12:20] = 1
    out2 = np.asarray(morphology.simple_connect2(jnp.asarray(img2)))
    assert out2[8, 10:12].sum() == 0


def test_rescue_filtered_repairs_piece_slivers():
    """A killed foreground sliver adjacent to survivors is restored; an
    isolated killed component stays dead."""
    pre = np.zeros((12, 32), np.int32)
    pre[6, 2:30] = np.arange(2, 30)     # one chain, piece labels vary
    filtered = pre.copy()
    filtered[6, 10:12] = -1             # sliver killed by piece filtering
    pre2 = pre.copy()
    pre2[2, 5:8] = 7                    # isolated weak component
    filtered2 = filtered.copy()
    filtered2[2, 5:8] = -1              # ... fully killed
    out = np.asarray(ccl.rescue_filtered(jnp.asarray(pre2),
                                         jnp.asarray(filtered2), 3))
    assert (out[6, 10:12] > 0).all()    # sliver restored
    assert (out[2, 5:8] == -1).all()    # isolated stays dead
    # sound: never sets background
    assert (out[pre2 == 0] <= 0).all()


def test_shallow_slope_quad_detected_end_to_end():
    """Regression for the staircase-fragmentation miss (scene seed 66 at
    448x336, previously err 14.7 px): with bridge_gap2 the quad detects
    at sub-px corner error."""
    import math
    import jax
    import tests.test_property as tp

    old = tp.W, tp.H
    tp.W, tp.H = 448, 336
    try:
        frame, quads = tp.random_scene(66)
    finally:
        tp.W, tp.H = old
    from rectdetect_tpu.config import EXTENDED_CONFIG
    from rectdetect_tpu.pipeline.rect import rect_frame, live_rects
    dets = live_rects(rect_frame(jnp.asarray(frame),
                                 math.tan(math.radians(72) / 2),
                                 EXTENDED_CONFIG))
    g = np.asarray(quads[0], np.float32)

    def err(d):
        c2 = np.asarray(d["c2"])
        best = np.inf
        for s in range(4):
            for f in (1, -1):
                idx = [(s + f * k) % 4 for k in range(4)]
                best = min(best, float(np.linalg.norm(c2 - g[idx],
                                                      axis=1).mean()))
        return best

    assert min(err(d) for d in dets) <= 3.0


def test_connect2_matches_golden():
    import golden.labeling as G
    r = np.random.default_rng(3)
    img = (r.random((40, 52)) < 0.22).astype(np.int32)
    a = np.asarray(morphology.simple_connect2(jnp.asarray(img)))
    b = G.simple_connect2(img.astype(np.int64))
    np.testing.assert_array_equal(a, b)


def test_rescue_matches_golden():
    import golden.labeling as G
    r = np.random.default_rng(4)
    pre = np.where(r.random((30, 40)) < 0.3,
                   r.integers(1, 900, (30, 40)), 0).astype(np.int32)
    filt = np.where(r.random((30, 40)) < 0.5, pre, -1).astype(np.int32)
    filt = np.where(pre > 0, filt, -1)
    a = np.asarray(ccl.rescue_filtered(jnp.asarray(pre),
                                       jnp.asarray(filt), 3))
    b = G.rescue_filtered(pre.astype(np.int64), filt.astype(np.int64), 3)
    np.testing.assert_array_equal(a, b)


def test_pallas_morph_bridge2_parity():
    """The fused Pallas chain with the connect2 stage (the production
    default on TPU) is bit-exact vs the jnp composition, both variants,
    including across block boundaries."""
    from rectdetect_tpu.ops.pallas_morph import morph_chain_pallas
    r = np.random.default_rng(6)
    eb = jnp.asarray((r.random((70, 48)) < 0.25).astype(np.int32))
    for variant in ("rect", "poly_branch"):
        a = np.asarray(morphology.strings_chain(eb, variant, bridge2=True))
        b = np.asarray(morph_chain_pallas(eb, variant, bh=24, bridge2=True))
        np.testing.assert_array_equal(a, b, err_msg=variant)
