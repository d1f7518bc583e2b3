"""Adversarial capacity-overflow behavior (fixed-capacity deviation 6).

The design replaces the reference's dynamic allocation with fixed
capacities (segment arena, hypothesis groups, reduceLS pair table,
compaction slot lists) whose overflow must degrade *gracefully and
deterministically*.  These tests overflow each structure on dense inputs
and pin the degraded behavior: re-execution identical, outputs sane, and
dropped-entry structures stay a subset of the uncapped truth.
"""

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from rectdetect_tpu.config import DEFAULT_CONFIG

TAN = math.tan(math.radians(72.0) / 2)


def _dense_scene(h=96, w=128, quads=(4, 6), seed=0):
    """Grid of small high-contrast quads + noise: many segments/groups."""
    r = np.random.default_rng(seed)
    img = np.full((h, w, 3), 70, np.uint8)
    qh, qw = h // quads[0], w // quads[1]
    for i in range(quads[0]):
        for j in range(quads[1]):
            y0, x0 = i * qh + 3, j * qw + 3
            col = (40 + 170 * ((i + j) % 2), 90 + 23 * i, 220 - 25 * j)
            img[y0:y0 + qh - 6, x0:x0 + qw - 6] = col
    img = (img.astype(np.int16) +
           r.integers(-4, 5, img.shape, dtype=np.int16)).clip(0, 255)
    return img.astype(np.uint8)


def test_arena_and_group_overflow_end_to_end_sane():
    """rect_frame with a segment arena and hypothesis-group cap far below
    the scene's demand: no crash, finite outputs, deterministic
    re-execution, live rects within bounds and within the group cap."""
    from rectdetect_tpu.pipeline.rect import rect_frame, live_rects

    bgr = jnp.asarray(_dense_scene())
    cfg = dataclasses.replace(DEFAULT_CONFIG, ls_capacity=64,
                              max_groups=4, max_group_segs=8)
    res1 = rect_frame(bgr, TAN, cfg)
    res2 = rect_frame(bgr, TAN, cfg)
    ok = np.asarray(res1.valid)
    for f in res1._fields:
        a = np.asarray(getattr(res1, f))
        np.testing.assert_array_equal(a, np.asarray(getattr(res2, f)),
                                      err_msg=f)
        if a.dtype.kind == "f":
            # inf is the dead-slot sentinel (pose residual of rejected
            # hypotheses); every LIVE slot must be finite
            live = ok if a.shape[:1] == ok.shape else np.ones(
                a.shape[0], bool)
            assert np.isfinite(a[live]).all(), f
    rects = live_rects(res1)
    assert len(rects) <= 4 * 2          # <= max_groups per hypothesis source
    h, w = 96, 128
    for r in rects:
        c = np.asarray(r["c2"])
        assert np.isfinite(c).all()
        assert (c[:, 0] > -w).all() and (c[:, 0] < 2 * w).all()
        assert (c[:, 1] > -h).all() and (c[:, 1] < 2 * h).all()


def test_arena_overflow_drops_out_of_range_labels_exactly():
    """mkpl_init with labels >= cap: in-range slots are bit-identical to
    the uncapped arena; out-of-range labels contribute nothing."""
    from rectdetect_tpu.ops.polyline import mkpl_init

    h, w = 24, 32
    r = np.random.default_rng(1)
    label = r.integers(0, 40, (h, w)).astype(np.int32)
    number = r.integers(1, 9, (h, w)).astype(np.int32) * (label > 0)

    small = mkpl_init(jnp.asarray(label), jnp.asarray(number), cap=16)
    big = mkpl_init(jnp.asarray(label), jnp.asarray(number), cap=64)
    for f in small._fields:
        s = np.asarray(getattr(small, f))
        b = np.asarray(getattr(big, f))
        if s.shape and s.shape[0] == 16:
            np.testing.assert_array_equal(s[1:16], b[1:16], err_msg=f)


def _true_pairs(boundary, lsid, w, h):
    """Loop-level (lsid, bid) -> clip-bbox relation over the 7x7 distinct-
    bid window (reduceLS, oclrect.cl:427-464).  Scenes are constructed so
    every window sees <= 4 distinct bids, making slot order irrelevant."""
    out = {}
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            l = int(lsid[y, x])
            if l <= 0:
                continue
            seen = []
            for dy in range(-3, 4):
                for dx in range(-3, 4):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        b = int(boundary[yy, xx])
                        if b > 0 and b not in seen:
                            seen.append(b)
            assert len(seen) <= 4, "test scene must stay within k_slots"
            for b in seen:
                v = (w - x, x, h - y, y)
                old = out.get((l, b))
                out[(l, b)] = (v if old is None else
                               tuple(max(a, c) for a, c in zip(old, v)))
    return out


def _reduce_ls_scene(h=48, w=64):
    """~150 (segment, boundary) pairs: tiled boundary ids + segment rows."""
    boundary = np.zeros((h, w), np.int32)
    for i in range(0, h, 12):
        for j in range(0, w, 16):
            boundary[i:i + 12, j:j + 16] = 1 + (i // 12) * 4 + (j // 16)
    lsid = np.zeros((h, w), np.int32)
    k = 1
    for y in range(2, h - 2, 4):
        for x0 in range(2, w - 10, 14):
            lsid[y, x0:x0 + 10] = k
            k += 1
    return boundary, lsid


def test_reduce_ls_table_overflow_subset_of_truth():
    """nentry far below the pair count (heavy hash collisions): the table
    is deterministic and every claimed entry is a REAL pair carrying its
    full true bbox (the min-claimant wins the slot; its bbox accumulates
    from all of its own pixels)."""
    from rectdetect_tpu.ops import reduce_ls

    h, w = 48, 64
    boundary, lsid = _reduce_ls_scene(h, w)
    truth = _true_pairs(boundary, lsid, w, h)
    nentry = 32                                  # << len(truth)
    assert len(truth) > 3 * nentry

    t1 = reduce_ls.pair_bbox_table(jnp.asarray(boundary),
                                   jnp.asarray(lsid), nentry)
    t2 = reduce_ls.pair_bbox_table(jnp.asarray(boundary),
                                   jnp.asarray(lsid), nentry)
    own1, bid1, bb1 = (np.asarray(t1.owner_lsid), np.asarray(t1.owner_bid),
                       np.asarray(t1.bb))
    np.testing.assert_array_equal(own1, np.asarray(t2.owner_lsid))
    np.testing.assert_array_equal(bb1, np.asarray(t2.bb))

    claimed = np.nonzero(own1)[0]
    assert len(claimed) >= nentry // 2           # table actually fills
    for i in claimed:
        key = (int(own1[i]), int(bid1[i]))
        assert key in truth, key
        np.testing.assert_array_equal(bb1[i], truth[key], err_msg=str(key))


def test_reduce_ls_edge_cap_overflow_truncates_not_corrupts():
    """edge_cap below the edge-pixel count: pairs remain a subset of the
    truth and every bbox is CONTAINED in the true pair bbox (dropped
    pixels can only shrink it)."""
    from rectdetect_tpu.ops import reduce_ls

    h, w = 48, 64
    boundary, lsid = _reduce_ls_scene(h, w)
    truth = _true_pairs(boundary, lsid, w, h)
    t = reduce_ls.pair_bbox_table(jnp.asarray(boundary), jnp.asarray(lsid),
                                  nentry=16384, edge_cap=64)
    own = np.asarray(t.owner_lsid)
    bid = np.asarray(t.owner_bid)
    bb = np.asarray(t.bb)
    claimed = np.nonzero(own)[0]
    assert len(claimed) > 0
    for i in claimed:
        key = (int(own[i]), int(bid[i]))
        assert key in truth, key
        assert (bb[i] <= np.asarray(truth[key])).all(), key


def test_plan_fits_boundary_is_exact():
    """The stale-plan probe fires exactly at its documented boundary
    (density * headroom <= 1 / sparse_factor), pinned by measuring the
    same string densities the probe uses."""
    from rectdetect_tpu.ops import morphology
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from rectdetect_tpu.runtime.calibrate import plan_fits
    from tests.conftest import synth_scene

    bgr = synth_scene(h=48, w=64, seed=2)
    cfg = dataclasses.replace(DEFAULT_CONFIG, sparse_factor=8,
                              strings_sparse_factor=8)
    fe = edge_frontend(jnp.asarray(bgr), cfg)
    d = max(
        float(jnp.mean((morphology.strings_chain(
            fe.edge_bin, "rect", bridge2=cfg.bridge_gap2) != 0)
            .astype(jnp.float32))),
        float(jnp.mean((morphology.strings_chain(
            fe.edge_bin, "poly_branch", bridge2=cfg.bridge_gap2) != 0)
            .astype(jnp.float32))))
    assert d > 0
    cap = 1.0 / cfg.sparse_factor
    # headroom just inside the boundary -> fits; just outside -> fires
    assert plan_fits(cfg, bgr, headroom=cap / d * 0.999)
    assert not plan_fits(cfg, bgr, headroom=cap / d * 1.001)
