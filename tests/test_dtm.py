"""Dynamic topic model tests (reference v0.6/src/DTM.jl).

Oracles follow SURVEY §4: ELBO monotonicity per outer iteration, slice
assignment parity with the reference's stamp-sorting loop (DTM.jl:58-63),
smoother correctness against a direct numpy Kalman smoother, and a
drifting-topic recovery end-to-end check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import topicmodelsvb_jl_tpu as tm
from topicmodelsvb_jl_tpu.models import dtm as dtm_mod


def _corpus(M=160, V=50, K=3, n_slices=4, seed=2):
    return tm.synth_corpus(M=M, V=V, K=K, seed=seed, n_slices=n_slices,
                           drift=0.3, mean_terms=18, mean_tokens=30)


def test_slice_assignment_matches_reference_loop():
    corp = _corpus()
    m = tm.DTM(corp, 3, delta=1.0)
    stamps = np.array([d.stamp for d in corp.docs])
    t0 = stamps.min()
    # reference loop (DTM.jl:58-63): walk docs by stamp, bump t while
    # stamp > t0 + t*delta
    S_ref = [[] for _ in range(m.T)]
    t = 1
    for d in np.argsort(stamps, kind="stable"):
        while stamps[d] > t0 + t * 1.0:
            t += 1
        S_ref[t - 1].append(d + 1)
    assert [sorted(s) for s in m.S] == [sorted(s) for s in S_ref]


def test_variance_and_mean_smoother_vs_numpy():
    T, K, V = 5, 2, 4
    v_filt, vbeta = dtm_mod.variance_smoother(T, K, V, jnp.float64)
    rng = np.random.default_rng(0)
    bh = rng.standard_normal((T, K, V))
    mbeta = np.asarray(dtm_mod.mean_smoother(jnp.asarray(bh), v_filt))

    # direct numpy transliteration of updateMbeta!/updateVbeta!
    # (DTM.jl:209-242) with sigmasq = bsq = v0 = 1, m0 = 0
    v = np.zeros((T, K, V))
    vp = np.ones((K, V))
    for t in range(T):
        v[t] = (1.0 / (vp + 1.0 + 1.0)) * (vp + 1.0)
        vp = v[t]
    vb = np.zeros((T, K, V))
    vb[T - 1] = v[T - 1]
    for t in range(T - 1, 0, -1):
        vb[t - 1] = v[t - 1] + (v[t - 1] / (v[t - 1] + 1.0)) ** 2 * (
            vb[t] - v[t - 1] - 1.0)
    np.testing.assert_allclose(np.asarray(v_filt), v, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vbeta), vb, rtol=1e-6, atol=1e-12)

    mnp = np.zeros((T, K, V))
    mp = np.zeros((K, V))
    vp = np.ones((K, V))
    for t in range(T):
        q = 1.0 / (vp + 1.0 + 1.0)
        mnp[t] = q * mp + (1 - q) * bh[t]
        mp = mnp[t]
        vp = v[t]
    mb = np.zeros((T, K, V))
    mb[T - 1] = mnp[T - 1]
    for t in range(T - 1, 0, -1):
        q = 1.0 / (v[t - 1] + 1.0)
        mb[t - 1] = q * mnp[t - 1] + (1 - q) * mb[t]
    np.testing.assert_allclose(mbeta, mb, rtol=1e-6, atol=1e-12)


def test_dtm_elbo_monotone():
    corp = _corpus()
    m = tm.DTM(corp, 3, delta=1.0, seed=5)
    m.train(iter=6, checkelbo=1, printelbo=False, cgiter=6)
    deltas = [r.delta_elbo for r in m.trainer.trace if r.delta_elbo is not None]
    assert len(deltas) >= 5
    assert all(d > 0 for d in deltas[: 5]), deltas


def test_dtm_topic_drift_recovery():
    """Planted drifting topics: the smoothed beta at different slices
    should differ (drift tracked), while topicdist stays a simplex."""
    corp = _corpus(M=240, n_slices=4)
    m = tm.DTM(corp, 3, delta=1.0, seed=1)
    m.train(iter=15, checkelbo=5, printelbo=False, cgiter=8)
    assert m.topics.shape == (m.T, 3, 50)
    td = m.topicdist(list(range(1, 11)))
    np.testing.assert_allclose(td.sum(axis=1), 1.0, rtol=1e-5)
    # drift: first/last slice rankings should not be identical everywhere
    assert not np.array_equal(m.topics[0], m.topics[-1])


def test_dtm_warm_start_from_lda():
    corp = _corpus()
    base = tm.LDA(corp, 3, seed=2)
    base.train(iter=5, checkelbo=float("inf"), printelbo=False)
    m = tm.DTM(corp, 3, delta=1.0, basemodel=base, seed=2)
    m.train(iter=3, checkelbo=1, printelbo=False, cgiter=4)
    deltas = [r.delta_elbo for r in m.trainer.trace if r.delta_elbo is not None]
    assert all(np.isfinite(d) for d in deltas)
    # mismatched K rejected
    with pytest.raises(tm.TopicModelError):
        tm.DTM(corp, 4, delta=1.0, basemodel=base)


def test_dtm_requires_stamps():
    corp = tm.synth_corpus(M=20, V=20, K=2, seed=0)  # no stamps
    with pytest.raises(tm.CorpusError):
        tm.DTM(corp, 2, delta=1.0)
