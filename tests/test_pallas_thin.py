"""Pallas thinning kernel vs the XLA formulation (interpret mode on CPU).

The two paths evaluate the identical polynomial with different fusion
(FMA contraction differs), so values agree to float ulp and the knife-edge
keep predicate (am1 <= a0 >= ap1 at exact float equality) may flip on a
tiny set — the same contract the XLA path has vs the golden oracle
(tests/test_edge_ops.py::test_thinthres_matches_golden)."""

import numpy as np
import jax
import jax.numpy as jnp

from rectdetect_tpu.ops import gradient, thin
from rectdetect_tpu.ops.pallas_thin import thinthres_pallas, thincubic_pallas


def _scene(h=40, w=56, seed=3):
    r = np.random.default_rng(seed)
    img = r.random((h, w)).astype(np.float32) * 4.0
    img[h // 4: 3 * h // 4, w // 3] += 30.0       # a vertical ridge
    img[h // 2, w // 5: 4 * w // 5] += 25.0       # a horizontal ridge
    em = jnp.asarray(img)
    vec = gradient.edgevec(em)
    return em, vec


def _check(want, got):
    mism = np.abs(got - want) > 1e-3
    assert mism.mean() < 0.01, f"{mism.sum()} gross mismatches"
    np.testing.assert_allclose(got[~mism], want[~mism], atol=1e-3)
    # zero/kept pattern agrees away from knife-edge ties
    assert ((want == 0) == (got == 0))[~mism].all()


def test_pallas_thinthres_matches_xla():
    em, vec = _scene()
    _check(np.asarray(thin.thinthres(em, vec)),
           np.asarray(thinthres_pallas(em, vec, bh=16)))


def test_pallas_thinthres_odd_size():
    em, vec = _scene(h=37, w=45, seed=9)
    _check(np.asarray(thin.thinthres(em, vec)),
           np.asarray(thinthres_pallas(em, vec, bh=16)))


def test_pallas_thincubic_matches_xla():
    em, vec = _scene(seed=11)
    _check(np.asarray(thin.thincubic(em, vec)),
           np.asarray(thincubic_pallas(em, vec, bh=16)))


def test_pallas_thinthres_vmap():
    ems, vecs = zip(*(_scene(seed=s) for s in (1, 2)))
    em = jnp.stack(ems)
    vec = jnp.stack(vecs)
    want = np.asarray(jax.vmap(thin.thinthres)(em, vec))
    got = np.asarray(jax.vmap(lambda e, v: thinthres_pallas(e, v, bh=16))(
        em, vec))
    for b in range(2):
        _check(want[b], got[b])
