"""fCTM correctness: oracle parity, ELBO monotonicity, frozen eta."""

import numpy as np

from topicmodelsvb_jl_tpu.api import fCTM
from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig

from oracle import FCTMOracle, docs_from_corpus


def _make(corp, K, dtype="float64", chunk=8, seed=3, n_devices=None):
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices=n_devices)
    rt = RuntimeConfig(chunk_docs=chunk, dtype=dtype, pad_multiple=8)
    return fCTM(corp, K, runtime=rt, mesh=mesh, seed=seed)


def test_fctm_matches_cpu_oracle(tiny_corpus):
    K, iters = 3, 3
    model = _make(tiny_corpus, K)
    beta0 = np.asarray(model.state.beta, np.float64)
    kappa0 = np.asarray(model.state.kappa, np.float64)

    oracle = FCTMOracle(docs_from_corpus(tiny_corpus), V=tiny_corpus.shape[1],
                        K=K, beta0=beta0, kappa0=kappa0)
    oracle_elbos = oracle.train(iters, niter=40)

    model.train(iter=iters, checkelbo=1, niter=40, printelbo=False)

    np.testing.assert_allclose(model.beta, oracle.beta, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(model.kappa, oracle.kappa, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(model.mu, oracle.mu, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(model.sigma, oracle.sigma, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(model.lam, np.stack(oracle.lam), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(model.vsq, np.stack(oracle.vsq), rtol=1e-5, atol=1e-8)
    for d in range(model.M):
        np.testing.assert_allclose(model.tau[d], oracle.tau[d], rtol=1e-5, atol=1e-8)
    traced = [r.elbo for r in model.trainer.trace if r.elbo is not None]
    np.testing.assert_allclose(traced, oracle_elbos, rtol=1e-6)


def test_fctm_elbo_monotone_and_eta_frozen(tiny_corpus):
    model = _make(tiny_corpus, K=3)
    model.train(iter=8, checkelbo=1, printelbo=False)
    deltas = [r.delta_elbo for r in model.trainer.trace if r.delta_elbo is not None]
    assert all(d > -1e-6 for d in deltas[1:])
    # eta must stay at 0.5 (update_eta! commented out, fCTM.jl:267)
    assert model.eta == 0.5
    assert np.all(np.linalg.eigvalsh(model.sigma) > 0)


def test_fctm_shard_equivalence(tiny_corpus):
    m1 = _make(tiny_corpus, K=3, n_devices=1)
    m8 = _make(tiny_corpus, K=3, n_devices=8)
    m1.train(iter=2, checkelbo=1, niter=30, printelbo=False)
    m8.train(iter=2, checkelbo=1, niter=30, printelbo=False)
    np.testing.assert_allclose(m1.beta, m8.beta, rtol=1e-8)
    np.testing.assert_allclose(m1.kappa, m8.kappa, rtol=1e-8)
    np.testing.assert_allclose(m1.elbo, m8.elbo, rtol=1e-8)


def test_fctm_identify_gauge_fix(tiny_corpus):
    """identify=True (CTM's projection normalisation, reference
    todo.txt:25) must keep mu sum-zero, sigma's 1-direction variance
    pinned at 1/K·1ᵀσ1 = 1, and the run valid/finite."""
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh
    from topicmodelsvb_jl_tpu.validate import check_model

    mesh = make_mesh(n_devices=1)
    rt = RuntimeConfig(chunk_docs=8, dtype="float64", pad_multiple=8)
    m = fCTM(tiny_corpus, 3, runtime=rt, mesh=mesh, seed=3, identify=True)
    m.train(iter=10, checkelbo=2, niter=30, printelbo=False, tol=0.0)
    assert np.isfinite(m.elbo)
    mu = np.asarray(m.state.mu)
    assert abs(mu.sum()) < 1e-10
    sig = np.asarray(m.state.sigma)
    one = np.ones(3) / np.sqrt(3.0)
    np.testing.assert_allclose(one @ sig @ one, 1.0, rtol=1e-10)
    check_model(m)
