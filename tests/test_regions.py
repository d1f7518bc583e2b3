"""Region-stage kernels vs the golden model (oclrect.cl:155-390)."""

import numpy as np
import jax.numpy as jnp
import pytest

from golden import regions as greg
from rectdetect_tpu.core import color
from rectdetect_tpu.ops import regions as treg


def make_scene(h=36, w=48, seed=1):
    """Packed-Lab image with colored blocks + a weak-edge map + junctions."""
    r = np.random.default_rng(seed)
    labf = np.zeros((h, w, 3), np.float32)
    labf[..., 0] = 0.2
    labf[..., 1] = 0.5
    labf[..., 2] = 0.5
    labf[6:20, 8:24, 0] = 0.31
    labf[6:20, 8:24, 1] = 0.62
    labf[14:30, 28:44, 0] = 0.12
    labf[14:30, 28:44, 2] = 0.4
    labf += r.normal(0, 0.002, labf.shape).astype(np.float32)
    labf = np.clip(labf, 0, 0.999)
    packed = np.asarray(color.pack_lab(jnp.asarray(labf)))

    edge = np.zeros((h, w), np.int64)
    edge[6, 8:24] = 1
    edge[19, 8:24] = 1
    edge[6:20, 8] = 1
    edge[6:20, 23] = 1
    edge[14, 28:44] = 1
    edge[25, 30:40] = 1
    edge[10:14, 30] = 1
    return packed.astype(np.int64), edge


@pytest.fixture(scope="module")
def scene():
    return make_scene()


def test_blblur_single_passes(scene):
    packed, edge = scene
    g0 = greg.blblur0(packed, edge)
    t0 = np.asarray(treg._blblur_axis(jnp.asarray(packed.astype(np.int32)),
                                      jnp.asarray(edge.astype(np.int32)),
                                      True))
    np.testing.assert_array_equal(t0.astype(np.int64) & 0xffffffff, g0 & 0xffffffff)
    g1 = greg.blblur1(g0, edge)
    t1 = np.asarray(treg._blblur_axis(jnp.asarray(t0),
                                      jnp.asarray(edge.astype(np.int32)),
                                      False))
    np.testing.assert_array_equal(t1.astype(np.int64) & 0xffffffff, g1 & 0xffffffff)


def test_blblur_iterated(scene):
    packed, edge = scene
    g = packed
    for _ in range(3):
        g = greg.blblur0(g, edge)
        g = greg.blblur1(g, edge)
    t = np.asarray(treg.blblur(jnp.asarray(packed.astype(np.int32)),
                               jnp.asarray(edge.astype(np.int32)), 3))
    np.testing.assert_array_equal(t.astype(np.int64) & 0xffffffff, g & 0xffffffff)


def test_quantize(scene):
    packed, _ = scene
    g = greg.quantize(packed, 24)
    t = np.asarray(treg.quantize_packed(jnp.asarray(packed.astype(np.int32))))
    np.testing.assert_array_equal(t.astype(np.int64) & 0xffffffff, g & 0xffffffff)


def test_despeckle(scene):
    packed, edge = scene
    em = edge.astype(np.float32) * 3.0   # edge magnitude proxy
    g = greg.despeckle(packed, em)
    t = np.asarray(treg.despeckle(jnp.asarray(packed.astype(np.int32)),
                                  jnp.asarray(em)))
    np.testing.assert_array_equal(t.astype(np.int64) & 0xffffffff, g & 0xffffffff)


def test_merge_mask():
    jn = np.zeros((40, 40), np.int64)
    jn[10, 10] = 3     # junction core
    jn[25, 30] = 2     # line end
    jn[30, 8] = 4
    g = greg.merge_mask(jn)
    t = np.asarray(treg.merge_mask(jnp.asarray(jn.astype(np.int32))))
    np.testing.assert_array_equal(t, g)


def test_label_merge_and_despeckle2(scene):
    packed, edge = scene
    em = edge.astype(np.float32) * 3.0
    q = greg.quantize(packed, 24)
    d = greg.despeckle(q, em)
    mask = greg.merge_mask(np.zeros_like(edge))
    # strong-edge label image: edge pixels get positive labels, rest -1
    elab = np.where(edge != 0, np.arange(edge.size).reshape(edge.shape) + 1,
                    -1)
    g = greg.label_merge(d, mask, elab)
    t = np.asarray(treg.label_merge(jnp.asarray(d.astype(np.int32)),
                                    jnp.asarray(mask.astype(np.int32)),
                                    jnp.asarray(elab.astype(np.int32))))
    np.testing.assert_array_equal(t, g)

    gs = greg.label_sizes(g)
    ts = np.asarray(treg.label_sizes(jnp.asarray(t)))
    np.testing.assert_array_equal(ts, gs[:ts.size])

    g2 = greg.despeckle2(g, gs, 16)
    t2 = np.asarray(treg.despeckle2(jnp.asarray(t), jnp.asarray(
        ts.astype(np.int32)), 16))
    np.testing.assert_array_equal(t2, g2)

    gb = greg.mark_boundary(g2)
    tb = np.asarray(treg.mark_boundary(jnp.asarray(t2)))
    np.testing.assert_array_equal(tb, gb)


def test_color_reassign_mean(scene):
    packed, _ = scene
    label = np.zeros(packed.shape, np.int64)
    label[:18, :] = 0
    label[18:, :] = 18 * packed.shape[1]
    got = np.asarray(treg.color_reassign(
        jnp.asarray(packed.astype(np.int32)),
        jnp.asarray(label.astype(np.int32))))
    # each region becomes one constant color
    assert len(np.unique(got[:18])) == 1
    assert len(np.unique(got[18:])) == 1


def test_xrandom_reference_ladder():
    from rectdetect_tpu.ops.rand import xrandom_pair, rand_field
    import jax.numpy as jnp

    def ref_xrandom(s):
        t = s
        for sh, x in ((24, 0xf3dd0fb7820fde37), (6, 0xe6c6ac2c59e52811),
                      (18, 0x2fc7871fff7c5b45), (48, 0x47c7e1f70aa4f7c5),
                      (0, 0x094f02b7fb9ba895), (12, 0x89afda817e744570),
                      (36, 0xc7277d052c7bf14b)):
            n = (s >> sh) & 63
            t = ((t << n) | (t >> ((64 - n) % 64))) & 0xFFFFFFFFFFFFFFFF
            t ^= x
        return t

    for s in (1, 12345, 0xdeadbeefcafef00d, 0x8000000000000001):
        hi = jnp.asarray([s >> 32], jnp.uint32)
        lo = jnp.asarray([s & 0xffffffff], jnp.uint32)
        ghi, glo = xrandom_pair(hi, lo)
        got = (int(ghi[0]) << 32) | int(glo[0])
        assert got == ref_xrandom(s), hex(s)
    # rand kernel form runs and is deterministic
    a = np.asarray(rand_field(64, seed=7))
    b = np.asarray(rand_field(64, seed=7))
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) > 32


def test_label_merge_side_asymmetry_adversarial():
    """Salt-and-pepper colors + random masks/edges exercise the per-side
    interiority/mask asymmetry of labelMergeMain (oclrect.cl:306-331) that
    a symmetric pair predicate gets wrong."""
    r = np.random.default_rng(3)
    h, w = 120, 160
    pix = r.integers(0, 4, (h, w)).astype(np.int64)
    pix[20:80, 30:90] = 7
    pix[40:110, 100:150] = 9
    mask = (r.random((h, w)) < 0.02).astype(np.int64)
    elab = np.where(r.random((h, w)) < 0.05,
                    np.arange(h * w).reshape(h, w) + 1, -1)
    ref = greg.label_merge(pix, mask, elab)
    got = np.asarray(treg.label_merge(
        jnp.asarray(pix.astype(np.int32)), jnp.asarray(mask.astype(np.int32)),
        jnp.asarray(elab.astype(np.int32))))
    np.testing.assert_array_equal(got, ref)


def test_simple_connect_rect_matches_golden():
    from golden import labeling as glab
    from rectdetect_tpu.ops import morphology
    r = np.random.default_rng(5)
    binary = (r.random((40, 56)) < 0.25).astype(np.int64)
    jn = glab.simple_junction(binary, positive_only=True)
    gold = glab.simple_connect_rect(jn)
    got = np.asarray(morphology.simple_connect_rect(
        jnp.asarray(jn.astype(np.int32))))
    np.testing.assert_array_equal(got, gold)


def test_sizes_despeckle2_runlength_matches_dense(scene):
    """The run-length fused calcSize+despeckle2 must equal the dense
    pair bit-for-bit, in both the run-length branch and the adversarial
    fallback."""
    packed, edge = scene
    em = edge.astype(np.float32) * 3.0
    q = greg.quantize(packed, 24)
    d = greg.despeckle(q, em)
    mask = greg.merge_mask(np.zeros_like(edge))
    elab = np.where(edge != 0,
                    np.arange(edge.size).reshape(edge.shape) + 1, -1)
    seg = treg.label_merge(jnp.asarray(d.astype(np.int32)),
                           jnp.asarray(mask.astype(np.int32)),
                           jnp.asarray(elab.astype(np.int32)))
    want = np.asarray(treg.despeckle2(seg, treg.label_sizes(seg), 16))
    # run-length branch (default factor; scene runs fit easily)
    got = np.asarray(treg.sizes_despeckle2(seg, 16, run_factor=16))
    np.testing.assert_array_equal(got, want)
    # checkerboard-ish adversarial map: every pixel its own run ->
    # overflows the cap (run_cap 4096 < n 65536 here) -> the cond must
    # take the dense fallback
    h, w = 128, 512
    rng = np.random.default_rng(7)
    adv = jnp.asarray(rng.integers(0, h * w, (h, w), dtype=np.int32))
    want2 = np.asarray(treg.despeckle2(adv, treg.label_sizes(adv), 16))
    got2 = np.asarray(treg.sizes_despeckle2(adv, 16, run_factor=16))
    np.testing.assert_array_equal(got2, want2)
