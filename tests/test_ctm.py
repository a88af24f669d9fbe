"""CTM correctness: oracle parity (batched Newton vs per-doc Newton),
ELBO monotonicity, sigma posdef maintenance, shard equivalence."""

import numpy as np
import pytest

import topicmodelsvb_jl_tpu as tm
from topicmodelsvb_jl_tpu.api import CTM
from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig

from oracle import CTMOracle, docs_from_corpus


def _make(corp, K, dtype="float64", chunk=8, seed=3, n_devices=None):
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices=n_devices)
    rt = RuntimeConfig(chunk_docs=chunk, dtype=dtype, pad_multiple=8)
    return CTM(corp, K, runtime=rt, mesh=mesh, seed=seed)


def test_ctm_matches_cpu_oracle(tiny_corpus):
    K, iters = 3, 3
    model = _make(tiny_corpus, K)
    beta0 = np.asarray(model.state.beta, np.float64)

    oracle = CTMOracle(docs_from_corpus(tiny_corpus), V=tiny_corpus.shape[1],
                       K=K, beta0=beta0)
    # keep niter modest: the oracle is a slow per-coordinate python loop
    oracle_elbos = oracle.train(iters, niter=40)

    model.train(iter=iters, checkelbo=1, niter=40, printelbo=False)

    np.testing.assert_allclose(model.beta, oracle.beta, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(model.mu, oracle.mu, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(model.sigma, oracle.sigma, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(model.lam, np.stack(oracle.lam), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(model.vsq, np.stack(oracle.vsq), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(model.logzeta, oracle.logzeta, rtol=1e-6)
    traced = [r.elbo for r in model.trainer.trace if r.elbo is not None]
    np.testing.assert_allclose(traced, oracle_elbos, rtol=1e-6)


def test_ctm_elbo_monotone_and_posdef(tiny_corpus):
    model = _make(tiny_corpus, K=4)
    model.train(iter=10, checkelbo=1, printelbo=False)
    deltas = [r.delta_elbo for r in model.trainer.trace if r.delta_elbo is not None]
    assert len(deltas) >= 9      # not vacuous if tracing regresses
    assert all(d > -1e-6 for d in deltas[1:])
    # sigma and invsigma must stay positive-definite (modelutils.jl:116-118)
    assert np.all(np.linalg.eigvalsh(model.sigma) > 0)
    assert np.all(np.linalg.eigvalsh(model.invsigma) > 0)


def test_ctm_shard_equivalence(tiny_corpus):
    m1 = _make(tiny_corpus, K=3, n_devices=1)
    m8 = _make(tiny_corpus, K=3, n_devices=8)
    m1.train(iter=3, checkelbo=1, niter=30, printelbo=False)
    m8.train(iter=3, checkelbo=1, niter=30, printelbo=False)
    np.testing.assert_allclose(m1.beta, m8.beta, rtol=1e-8)
    np.testing.assert_allclose(m1.sigma, m8.sigma, rtol=1e-8)
    np.testing.assert_allclose(m1.elbo, m8.elbo, rtol=1e-8)


def test_ctm_topicdist(tiny_corpus):
    model = _make(tiny_corpus, K=3)
    model.train(iter=2, checkelbo=np.inf, niter=20, printelbo=False)
    td = model.topicdist(1)
    assert td.shape == (3,) and np.isclose(td.sum(), 1.0)


def _planted_k4_corpus(seed=0):
    rng = np.random.default_rng(seed)
    docs = []
    for d in range(60):
        k = d % 4
        fam = np.arange(k * 10 + 1, (k + 1) * 10 + 1)
        L = rng.integers(15, 30)
        terms, counts = np.unique(rng.choice(fam, size=L), return_counts=True)
        docs.append(tm.Document(terms=[int(t) for t in terms],
                                counts=[int(c) for c in counts]))
    return tm.Corpus(docs=docs, vocab={j: f"w{j}" for j in range(1, 41)})


@pytest.mark.slow
def test_ctm_identify_bounds_gauge_degeneracy():
    """Reference todo.txt:25 / issue #14: the logistic-normal has K−1
    dof, so long-run CAVI gauge-fixes itself — one lambda coordinate
    contracts to a deterministic level and a sigma eigenvalue decays
    ~1/iter without bound.  ``identify=True`` (the projection
    normalisation the reference proposes but never implemented) must
    pin cond(sigma) flat while plain CAVI's grows past 1e4, with the
    SAME planted-topic recovery either way."""
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh
    from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig

    conds, masses = {}, {}
    # whether/when the gauge mode contracts depends on the init draw —
    # a round-5 seed scan (0..5, 600 iters) found most draws sit at a
    # symmetric optimum (cond ~6, flat) while seed=2's optimum breaks
    # the 1-direction symmetry and contracts (269 → 7.7e3 → 4.8e4 over
    # 200/400/600 iters).  The test pins the draw that exhibits the
    # reference's reported pathology; the projection must kill it on
    # that same draw.
    for ident, iters in ((False, 600), (True, 600)):
        m = CTM(_planted_k4_corpus(), 4, seed=2,
                runtime=RuntimeConfig(chunk_docs=16, dtype="float64",
                                      pad_multiple=8),
                mesh=make_mesh(n_devices=1), identify=ident)
        m.train(iter=iters, checkelbo=float("inf"), printelbo=False,
                niter=50, tol=0.0)
        ev = np.linalg.eigvalsh(np.asarray(m.state.sigma))
        conds[ident] = float(ev[-1] / ev[0])
        beta = np.asarray(m.beta)
        fams = np.array([[beta[k, j * 10:(j + 1) * 10].sum()
                          for j in range(4)] for k in range(4)])
        masses[ident] = float(fams.max(axis=1).min())
    # the degeneracy is real (measured 4.8e4 at 600 iters)...
    assert conds[False] > 1e4, conds
    # ...and the projection kills it (measured ~11, flat)
    assert conds[True] < 100, conds
    # the fit itself is gauge-invariant: the projection changes sigma's
    # conditioning, not the topics — both arms land on the same beta
    # mass split (this draw's optimum merges two families, which is
    # exactly WHY its gauge mode contracts; the scan's other seeds
    # recover all four families and never develop the degeneracy)
    assert abs(masses[True] - masses[False]) < 0.05, masses
