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
