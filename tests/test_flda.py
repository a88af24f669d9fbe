"""fLDA correctness: oracle parity, ELBO monotonicity, behavior of the
background-word switch."""

import numpy as np

import topicmodelsvb_jl_tpu as tm
from topicmodelsvb_jl_tpu.api import fLDA
from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig

from oracle import FLDAOracle, docs_from_corpus


def _make(corp, K, dtype="float64", chunk=8, seed=3, n_devices=None):
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices=n_devices)
    rt = RuntimeConfig(chunk_docs=chunk, dtype=dtype, pad_multiple=8)
    return fLDA(corp, K, runtime=rt, mesh=mesh, seed=seed)


def test_flda_matches_cpu_oracle(tiny_corpus):
    K, iters = 4, 4
    model = _make(tiny_corpus, K)
    beta0 = np.asarray(model.state.beta, np.float64)
    kappa0 = np.asarray(model.state.kappa, np.float64)

    oracle = FLDAOracle(docs_from_corpus(tiny_corpus), V=tiny_corpus.shape[1],
                        K=K, beta0=beta0, kappa0=kappa0)
    oracle_elbos = oracle.train(iters)

    model.train(iter=iters, checkelbo=1, printelbo=False)

    np.testing.assert_allclose(model.beta, oracle.beta, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(model.kappa, oracle.kappa, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(model.alpha, oracle.alpha, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(model.eta, oracle.eta, rtol=1e-8)
    np.testing.assert_allclose(model.gamma, np.stack(oracle.gamma), rtol=1e-6, atol=1e-9)
    for d in range(model.M):
        np.testing.assert_allclose(model.tau[d], oracle.tau[d], rtol=1e-6, atol=1e-9)
    traced = [r.elbo for r in model.trainer.trace if r.elbo is not None]
    np.testing.assert_allclose(traced, oracle_elbos, rtol=1e-7)


def test_flda_elbo_monotone(tiny_corpus):
    model = _make(tiny_corpus, K=4)
    model.train(iter=12, checkelbo=1, printelbo=False)
    deltas = [r.delta_elbo for r in model.trainer.trace if r.delta_elbo is not None]
    assert all(d > -1e-6 for d in deltas[1:])


def test_flda_shard_equivalence(tiny_corpus):
    m1 = _make(tiny_corpus, K=3, n_devices=1)
    m8 = _make(tiny_corpus, K=3, n_devices=8)
    m1.train(iter=3, checkelbo=1, printelbo=False)
    m8.train(iter=3, checkelbo=1, printelbo=False)
    np.testing.assert_allclose(m1.beta, m8.beta, rtol=1e-9)
    np.testing.assert_allclose(m1.kappa, m8.kappa, rtol=1e-9)
    np.testing.assert_allclose(m1.eta, m8.eta, rtol=1e-10)
    np.testing.assert_allclose(m1.elbo, m8.elbo, rtol=1e-9)


def test_flda_eta_and_tau_ranges(tiny_corpus):
    model = _make(tiny_corpus, K=3, dtype="float32")
    model.train(iter=5, checkelbo=np.inf, printelbo=False)
    assert 0.0 <= model.eta <= 1.0
    for t in model.tau:
        assert np.all((t >= 0) & (t <= 1))
    assert np.allclose(model.kappa.sum(), 1.0, atol=1e-5)
