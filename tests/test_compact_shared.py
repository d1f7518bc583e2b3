"""Shared-compaction polyline table ops vs their dense formulations."""

import numpy as np
import jax.numpy as jnp

from rectdetect_tpu.ops import ccl, morphology
from rectdetect_tpu.ops.chain import arc_number, break_loops, count_ends
from rectdetect_tpu.ops.compact import compact_mask, compact_subset


def _strings(h=64, w=80, seed=7, p=0.12):
    r = np.random.default_rng(seed)
    eb = (r.random((h, w)) < p).astype(np.int32)
    eb[h // 3, 4:w - 4] = 1
    eb[4:h - 4, w // 2] = 1
    return np.asarray(morphology.strings_chain(jnp.asarray(eb),
                                               "poly_branch"))


def test_count_ends_comp_matches_dense():
    s = _strings()
    lab = ccl.label_components(jnp.asarray(s), 0, 10, 8)
    jn = morphology.simple_junction(jnp.asarray(s))
    comp = compact_mask(jnp.asarray(s != 0).reshape(-1), 2048)
    a = np.asarray(count_ends(jn, lab))
    b = np.asarray(count_ends(jn, lab, comp))
    np.testing.assert_array_equal(a, b)


def test_arc_number_shared_comp_matches_dense():
    s = _strings(seed=11)
    lab = ccl.label_components(jnp.asarray(s), 0, 10, 8)
    jn = morphology.simple_junction(jnp.asarray(s))
    comp = compact_mask(jnp.asarray(s != 0).reshape(-1), 2048)
    ne = count_ends(jn, lab, comp)
    s2, lab2 = break_loops(jnp.asarray(s), lab, ne)
    want = np.asarray(arc_number(lab2, 12)[0])
    got = np.asarray(arc_number(lab2, 12, comp=comp)[0])
    np.testing.assert_array_equal(want, got)


def test_filter_relabel_sparse_matches_dense():
    s = _strings(seed=13)
    lab = ccl.label_components(jnp.asarray(s), 0, 10, 8)
    jn = morphology.simple_junction(jnp.asarray(s))
    comp = compact_mask(jnp.asarray(s != 0).reshape(-1), 2048)
    ne = count_ends(jn, lab, comp)
    _, lab2 = break_loops(jnp.asarray(s), lab, ne)
    num, _, _ = arc_number(lab2, 12, comp=comp)
    arcs = ccl.label_arcs(num, 12, 8)
    sizes_d = np.asarray(ccl.component_sizes(arcs, ignore=0))
    sizes_c = np.asarray(ccl.component_sizes(arcs, ignore=0, comp=comp))
    np.testing.assert_array_equal(sizes_d, sizes_c)
    for thre in (3, 10):
        want, wc = ccl.relabel_dense(ccl.filter_size(
            arcs, jnp.asarray(sizes_d), thre))
        got, gc = ccl.filter_relabel_sparse(arcs, jnp.asarray(sizes_d),
                                            thre, comp)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
        assert int(wc) == int(gc)


def test_compact_subset_matches_fresh_compaction():
    s = _strings(seed=17)
    full = jnp.asarray(s != 0).reshape(-1)
    comp = compact_mask(full, 2048)
    r = np.random.default_rng(3)
    keep_pix = np.asarray(full) & (r.random(full.shape[0]) < 0.4)
    keep_slots = jnp.asarray(keep_pix)[jnp.clip(comp.idx, 0,
                                                full.shape[0] - 1)]
    for cap2 in (64, 512):
        a = compact_mask(jnp.asarray(keep_pix), cap2)
        b = compact_subset(comp, keep_slots, cap2)
        np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
        np.testing.assert_array_equal(np.asarray(a.slot_of),
                                      np.asarray(b.slot_of))
        assert int(a.n) == int(b.n)


def test_strength_ops_comp_match_dense():
    from rectdetect_tpu.ops import morphology as M
    r = np.random.default_rng(21)
    eb = (r.random((64, 96)) < 0.25).astype(np.int32)
    eb[10, 5:90] = 1
    s = M.strings_chain(jnp.asarray(eb), "rect")
    lab = ccl.label_components(s, 0, 10, 8)
    lab = jnp.where(s != 0, lab, -1)
    edge = jnp.asarray(r.random((64, 96)).astype(np.float32))
    comp = compact_mask(jnp.asarray(np.asarray(s) != 0).reshape(-1), 4096)
    st_d = ccl.calc_strength(edge, lab)
    st_c = ccl.calc_strength(edge, lab, comp=comp)
    np.testing.assert_array_equal(np.asarray(st_d), np.asarray(st_c))
    for thre in (50, 500):
        a = ccl.filter_strength(lab, st_d, thre)
        b = ccl.filter_strength(lab, st_d, thre, comp=comp)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dense_roots_matches_scatter():
    from rectdetect_tpu.ops import reduce_ls
    r = np.random.default_rng(9)
    lab = np.full((48, 64), -1, np.int32)
    # a few components with min-flat-index roots
    for k in range(7):
        y, x = r.integers(2, 40), r.integers(2, 50)
        root = y * 64 + x
        lab[y:y + 3, x:x + 4] = root
    lj = jnp.asarray(lab)
    dense, table, cnt, _ = reduce_ls.densify_labels(lj, bg=-1)
    gmax = 16
    n = 48 * 64
    idxs = np.arange(n, dtype=np.int32)
    flatb = lab.reshape(-1)
    is_root = (flatb == idxs) & (flatb >= 0)
    want = np.zeros((gmax + 1,), np.int32)
    for i in np.nonzero(is_root)[0]:
        d = int(np.asarray(table)[flatb[i]])
        if d <= gmax:
            want[d] = i
    got = np.asarray(reduce_ls.dense_roots(lj, gmax, bg=-1))
    for g in range(1, int(cnt) + 1):
        if g <= gmax:
            assert got[g] == want[g], (g, got[g], want[g])
