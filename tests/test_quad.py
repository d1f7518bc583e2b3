"""Quad hypothesis reduction vs the golden model (oclrect.c:886-1151)."""

import numpy as np
import jax.numpy as jnp

from golden import geometry as ggeo
from rectdetect_tpu.geometry import quad as tquad


def noisy_quad_segments(corners, n_extra=6, seed=3, frac=0.8):
    """Segments along a quad's sides (partial, jittered) + short clutter."""
    r = np.random.default_rng(seed)
    segs = []
    c = np.asarray(corners, np.float64)
    for i in range(4):
        a, b = c[i], c[(i + 1) % 4]
        lo, hi = (1 - frac) / 2, 1 - (1 - frac) / 2
        e0 = a + (b - a) * lo + r.normal(0, 0.15, 2)
        e1 = a + (b - a) * hi + r.normal(0, 0.15, 2)
        segs.append((e0, e1))
    for _ in range(n_extra):
        p = r.uniform(5, 90, 2)
        d = r.normal(0, 1.5, 2)
        segs.append((p, p + d))
    return segs


def to_batch(seg_lists, k=32):
    g = len(seg_lists)
    segs = np.zeros((g, k, 2, 2), np.float32)
    valid = np.zeros((g, k), bool)
    for gi, sl in enumerate(seg_lists):
        for si, (a, b) in enumerate(sl[:k]):
            segs[gi, si, 0] = a
            segs[gi, si, 1] = b
            valid[gi, si] = True
    return jnp.asarray(segs), jnp.asarray(valid)


def test_hull_matches_quickhull():
    r = np.random.default_rng(0)
    pts = r.uniform(0, 100, (40, 2)).astype(np.float32)
    gold = ggeo.quick_hull([p.astype(np.float64) for p in pts])
    gold_set = {tuple(np.round(p.astype(np.float64), 3)) for p in gold}
    idx, hv = tquad.jarvis_hull(jnp.asarray(pts),
                                jnp.ones((40,), bool), 24)
    got = {tuple(np.round(np.asarray(pts[i]).astype(np.float64), 3))
           for i, v in zip(np.asarray(idx), np.asarray(hv)) if v}
    assert got == gold_set


def test_reduce_recovers_quad_corners():
    corners = [(20.0, 15.0), (80.0, 22.0), (74.0, 70.0), (25.0, 64.0)]
    seg_lists = [noisy_quad_segments(corners, seed=s) for s in (1, 2, 5)]
    segs, valid = to_batch(seg_lists)
    tc, tok = tquad.reduce_groups(segs, valid)
    tc = np.asarray(tc)
    tok = np.asarray(tok)

    for gi, sl in enumerate(seg_lists):
        gold = ggeo.reduce_group(sl)
        if gold is None:
            assert not tok[gi]
            continue
        assert tok[gi]
        gold_corners = np.array([ls[0] for ls in gold])
        # both produce the quad corner cycle; allow rotation/reflection
        got = tc[gi]
        best = 1e9
        for off in range(4):
            for flip in (1, -1):
                perm = [(off + flip * i) % 4 for i in range(4)]
                best = min(best, np.abs(got[perm] - gold_corners).max())
        assert best < 0.75, (gi, best, got, gold_corners)


def test_reduce_clean_scene_hits_true_corners():
    corners = [(20.0, 15.0), (80.0, 22.0), (74.0, 70.0), (25.0, 64.0)]
    sl = noisy_quad_segments(corners, n_extra=0, seed=9)
    segs, valid = to_batch([sl])
    tc, tok = tquad.reduce_groups(segs, valid)
    assert bool(tok[0])
    got = np.asarray(tc[0])
    for t in np.asarray(corners):
        assert np.min(np.hypot(got[:, 0] - t[0],
                               got[:, 1] - t[1])) < 3.0


def test_reduce_rejects_collinear_clutter():
    r = np.random.default_rng(7)
    segs = []
    for _ in range(8):
        x = r.uniform(0, 100)
        segs.append((np.array([x, 10.0]), np.array([x + 20, 10.5])))
    batch, valid = to_batch([segs])
    _, ok = tquad.reduce_groups(batch, valid)
    assert not bool(ok[0])


def test_clip_line_matches_golden():
    r = np.random.default_rng(11)
    from rectdetect_tpu.geometry.clip import clip_segments
    n = 64
    p = r.uniform(-30, 130, (n, 4)).astype(np.float32)
    box = np.array([10.0, 20.0, 90.0, 80.0], np.float32)
    got = np.asarray(clip_segments(jnp.asarray(p),
                                   jnp.asarray(np.tile(box, (n, 1)))))
    for i in range(n):
        gold = ggeo.clip_line(*[float(v) for v in p[i]],
                              box[0], box[1], box[2], box[3])
        if gold is None:
            assert np.isnan(got[i]).all(), (i, got[i])
        else:
            np.testing.assert_allclose(got[i], gold, atol=1e-3)
