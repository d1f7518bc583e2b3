"""Polyline stage: chain traversal, arc numbering/labeling, mkpl, refine.

Each TPU op is verified against the loop-level golden model
(golden/polyline.py), which mirrors the reference kernels
(oclpolyline.cl) with the deterministic tie-break/allocation rules the
TPU build defines (SURVEY.md §7).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from golden import labeling as glab
from golden import polyline as gpoly
from rectdetect_tpu.ops import chain as tchain
from rectdetect_tpu.ops import ccl as tccl
from rectdetect_tpu.ops import polyline as tpoly


def make_strings(h=40, w=56):
    """Binary image with several pixel strings: diagonal, L, arc, loop."""
    img = np.zeros((h, w), np.int32)
    for i in range(20):                    # diagonal
        img[3 + i // 2, 4 + i] = 1
    img[28, 6:30] = 1                      # horizontal + corner (L)
    img[16:29, 6] = 1
    for i in range(18):                    # gentle arc
        img[8 + (i * i) // 40, 30 + i] = 1
    img[32:38, 40:47] = 1                  # filled block -> loop after thin
    img[33:37, 41:46] = 0
    img[10, 50:54] = 1                     # tiny string (size filtered)
    return img


def ccl_ref(img):
    return glab.label_components(img, 0)


@pytest.fixture(scope="module")
def strings():
    return make_strings()


@pytest.fixture(scope="module")
def labeled(strings):
    """String labels the way the pipeline produces them: degree <= 2
    everywhere (stringify + removeBranch) — getnp traversal semantics are
    only well-defined then (degree-3 remnants give the reference's flag
    algebra scheduling-dependent walks)."""
    jn = glab.simple_junction(strings)
    conn = glab.simple_connect_poly(jn)
    s = glab.stringify(conn, 0)
    s = glab.stringify(s, 1)
    clean = glab.remove_branch(s)
    lbl = ccl_ref(clean)
    jn2 = glab.simple_junction(clean)
    nends = gpoly.count_ends(jn2, lbl)
    _, lbl = gpoly.break_loops(clean, lbl, nends)
    return lbl.astype(np.int32)


def test_chain_neighbors_matches_getnp(labeled):
    n0g, n1g = gpoly.chain_neighbors(labeled)
    n0t, n1t = tchain.chain_neighbors(jnp.asarray(labeled))
    np.testing.assert_array_equal(np.asarray(n0t), n0g)
    np.testing.assert_array_equal(np.asarray(n1t), n1g)


def test_arc_number_matches_walk(labeled):
    gold = gpoly.arc_number(labeled)
    got, _, _ = tchain.arc_number(jnp.asarray(labeled))
    np.testing.assert_array_equal(np.asarray(got), gold)


def test_count_ends_and_break_loops(strings):
    lbl = ccl_ref(strings)
    jn = glab.simple_junction(strings)
    gold_ends = gpoly.count_ends(jn, lbl)
    got_ends = tchain.count_ends(jnp.asarray(jn.astype(np.int32)),
                                 jnp.asarray(lbl.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(got_ends), gold_ends)

    ge, gl = gpoly.break_loops(strings, lbl, gold_ends)
    te, tl = tchain.break_loops(jnp.asarray(strings),
                                jnp.asarray(lbl.astype(np.int32)),
                                jnp.asarray(gold_ends.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(te), ge)
    np.testing.assert_array_equal(np.asarray(tl), gl)


def test_label_arcs(labeled):
    number = gpoly.arc_number(labeled)
    gold = gpoly.label_arcs(number)
    got = tccl.label_arcs(jnp.asarray(number.astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(got), gold)


def test_relabel_dense(labeled):
    number = gpoly.arc_number(labeled)
    arcs = gpoly.label_arcs(number)
    gold, gold_count = gpoly.filter_and_relabel(arcs, 5)
    sizes = tccl.component_sizes(jnp.asarray(arcs.astype(np.int32)),
                                 ignore=0)
    filt = tccl.filter_size(jnp.asarray(arcs.astype(np.int32)), sizes, 5)
    got, got_count = tccl.relabel_dense(filt)
    assert int(got_count) == gold_count
    np.testing.assert_array_equal(np.asarray(got), gold)


def _tpu_segments(arena, count):
    out = {}
    a = {k: np.asarray(v) for k, v in arena._asdict().items()}
    for g in range(1, count + 1):
        if a["polyid"][g] == 0:
            continue
        out[g] = (a["sx"][g], a["sy"][g], a["ex"][g], a["ey"][g],
                  int(a["start_index"][g]), int(a["end_index"][g]),
                  int(a["left_ptr"][g]), int(a["right_ptr"][g]))
    return out


def _gold_segments(segs, count):
    out = {}
    for g in range(1, count + 1):
        s = segs[g]
        if s.polyid == 0:
            continue
        out[g] = (s.sx, s.sy, s.ex, s.ey, s.si, s.ei, s.left, s.right)
    return out


@pytest.mark.parametrize("do_refine", [False, True])
def test_polyline_end_to_end(strings, do_refine):
    cap = 256
    gsegs, glabimg, gcount = gpoly.polyline_execute(
        strings, minerror=1.0, size_thre=5, cap=cap, do_refine=do_refine)

    edge = jnp.asarray(strings)
    if do_refine:
        arena, lsid = tpoly.polyline_execute(edge, 1.0, 5, cap)
    else:
        from rectdetect_tpu.ops import morphology
        from rectdetect_tpu.config import DEFAULT_CONFIG as cfg
        jn = morphology.simple_junction(edge)
        conn = morphology.simple_connect_poly(jn)
        s = morphology.stringify(conn, 0)
        s = morphology.stringify(s, 1)
        strs = morphology.remove_branch(s)
        lbl = tccl.label_components(strs, 0, cfg.ccl_passes, cfg.ccl_jumps)
        jn2 = morphology.simple_junction(strs)
        nends = tchain.count_ends(jn2, lbl)
        strs, lbl = tchain.break_loops(strs, lbl, nends)
        number, _, _ = tchain.arc_number(lbl)
        arcs = tccl.label_arcs(number)
        sizes = tccl.component_sizes(arcs, ignore=0)
        filt = tccl.filter_size(arcs, sizes, 5)
        dense, _ = tccl.relabel_dense(filt)
        arena = tpoly.mkpl_init(dense, number, cap)
        arena, lsid = tpoly.mkpl_subdivide(arena, dense, number, 1.0,
                                           cfg.mkpl_iters)

    count = int(arena.count)
    assert count == gcount

    got = _tpu_segments(arena, count)
    gold = _gold_segments(gsegs, gcount)
    assert set(got.keys()) == set(gold.keys())
    tol = 2e-2 if do_refine else 1e-4
    for g in got:
        gv, tv = gold[g], got[g]
        np.testing.assert_allclose(tv[:4], gv[:4], atol=tol)
        assert tv[4:] == gv[4:], f"seg {g}: {tv[4:]} != {gv[4:]}"

    if not do_refine:
        np.testing.assert_array_equal(np.asarray(lsid), glabimg)


def test_polyline_straight_line_is_single_segment():
    img = np.zeros((24, 64), np.int32)
    img[10, 4:60] = 1
    arena, _ = tpoly.polyline_execute(jnp.asarray(img), 1.0, 5, 128)
    a = {k: np.asarray(v) for k, v in arena._asdict().items()}
    live = [g for g in range(1, int(arena.count) + 1) if a["polyid"][g]]
    assert len(live) == 1
    g = live[0]
    ys = (a["sy"][g], a["ey"][g])
    assert np.allclose(ys, 10.0, atol=0.5)
    xs = sorted((a["sx"][g], a["ex"][g]))
    assert xs[0] < 8 and xs[1] > 55


def test_polyline_rectangle_outline_four_corners():
    img = np.zeros((48, 64), np.int32)
    img[10, 10:50] = 1
    img[34, 10:50] = 1
    img[10:35, 10] = 1
    img[10:35, 49] = 1
    arena, _ = tpoly.polyline_execute(jnp.asarray(img), 1.0, 5, 256)
    a = {k: np.asarray(v) for k, v in arena._asdict().items()}
    live = [g for g in range(1, int(arena.count) + 1) if a["polyid"][g]]
    # a rectangle outline is one loop -> broken into one chain -> should
    # subdivide into ~4 segments aligned with the sides
    assert 3 <= len(live) <= 6
    lens = [np.hypot(a["ex"][g] - a["sx"][g], a["ey"][g] - a["sy"][g])
            for g in live]
    assert sum(l > 15 for l in lens) >= 4 or len(live) == 4


def test_arc_capacity_switch_bit_identical(strings):
    """The runtime arc-capacity switch (small mkpl/refine slot lists +
    small working arena) must be bit-identical to the big branch when
    the arc pixels fit, including the padded arena/compaction tails."""
    import dataclasses
    from rectdetect_tpu.config import DEFAULT_CONFIG

    edge = jnp.asarray(strings)
    cap = 256
    big_cfg = dataclasses.replace(DEFAULT_CONFIG, arc_small_factor=0)
    small_cfg = DEFAULT_CONFIG          # switch enabled (default)

    a_big, l_big, c_big = tpoly.polyline_execute(
        edge, 1.0, 5, cap, big_cfg, return_comp=True)
    a_small, l_small, c_small = tpoly.polyline_execute(
        edge, 1.0, 5, cap, small_cfg, return_comp=True)

    for f in tpoly.SegmentArena._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a_big, f)), np.asarray(getattr(a_small, f)),
            err_msg=f"arena field {f}")
    np.testing.assert_array_equal(np.asarray(l_big), np.asarray(l_small))
    np.testing.assert_array_equal(np.asarray(c_big.idx),
                                  np.asarray(c_small.idx))
    np.testing.assert_array_equal(np.asarray(c_big.slot_of),
                                  np.asarray(c_small.slot_of))
    assert int(c_big.n) == int(c_small.n)


def test_arc_capacity_switch_overflow_falls_back(strings):
    """When arcs exceed the small cap the cond must take the big branch
    (same outputs as arc_small_factor=0) instead of truncating."""
    import dataclasses
    from rectdetect_tpu.config import DEFAULT_CONFIG

    # dense arc scene: many long horizontal lines
    img = np.zeros((64, 96), np.int32)
    img[2:62:3, 4:92] = 1
    edge = jnp.asarray(img)
    cap = 2048
    # arc_small_factor huge -> small cap = max(1024, n//100000) = 1024;
    # arc pixels = 20*88 = 1760 > 1024 -> must fall back
    cfg_sw = dataclasses.replace(DEFAULT_CONFIG, arc_small_factor=100000)
    cfg_big = dataclasses.replace(DEFAULT_CONFIG, arc_small_factor=0)
    a_sw, l_sw = tpoly.polyline_execute(edge, 1.0, 5, cap, cfg_sw)
    a_big, l_big = tpoly.polyline_execute(edge, 1.0, 5, cap, cfg_big)
    for f in tpoly.SegmentArena._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a_big, f)), np.asarray(getattr(a_sw, f)),
            err_msg=f"arena field {f}")
    np.testing.assert_array_equal(np.asarray(l_big), np.asarray(l_sw))


def test_walk_prefilter_bit_identical():
    """The small-component pre-kill (walk_prefilter_factor) must be
    bit-identical to the unfiltered walk: killed components could never
    pass the arc size filter, so arena/lsid/compaction all match.

    The frame is sized so the filtered capacity is genuinely smaller
    than the strings capacity (max(4096,...) floors would otherwise
    statically bypass the filter)."""
    import dataclasses
    from rectdetect_tpu.config import DEFAULT_CONFIG

    h, w = 256, 512
    r = np.random.default_rng(5)
    e = (r.random((h, w)) < 0.06).astype(np.int64)   # noise fragments
    for y in range(20, h - 20, 24):                  # long chains
        e[y, 8:w - 8] = 1
    e[40:200, 70] = 1
    e[60, 100:400] = 0                               # cut one line
    edge = jnp.asarray(e.astype(np.int32))
    cap = 2048
    n = h * w
    sp = max(4096, n // DEFAULT_CONFIG.strings_sparse_factor)
    s1 = max(4096, n // 24)
    assert s1 < sp, "test frame must engage the filtered branch"
    off = dataclasses.replace(DEFAULT_CONFIG, walk_prefilter_factor=0)
    on = dataclasses.replace(DEFAULT_CONFIG, walk_prefilter_factor=24)
    # size_thre 5: the synthetic map has both small fragments (killed)
    # and long chains (kept)
    a0, l0, c0 = tpoly.polyline_execute(edge, 1.0, 5, cap, off,
                                        return_comp=True)
    a1, l1, c1 = tpoly.polyline_execute(edge, 1.0, 5, cap, on,
                                        return_comp=True)
    for f in tpoly.SegmentArena._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a0, f)), np.asarray(getattr(a1, f)),
            err_msg=f"arena field {f}")
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(c0.idx), np.asarray(c1.idx))

    # pinned-filtered (batch mode) equally identical when survivors fit
    pin = dataclasses.replace(on, pin_walk_prefilter=1)
    a2, l2, _ = tpoly.polyline_execute(edge, 1.0, 5, cap, pin,
                                       return_comp=True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l2))

    # survivor overflow: tiny S1 forces the cond fallback to the full
    # walk — still bit-identical
    ov = dataclasses.replace(on, walk_prefilter_factor=10 ** 6)
    a3, l3, _ = tpoly.polyline_execute(edge, 1.0, 5, cap, ov,
                                       return_comp=True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l3))
