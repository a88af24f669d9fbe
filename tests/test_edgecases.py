"""Degenerate-input hardening across all models (the reference handles
these via the iteration-zeroing trick at train! entry, LDA.jl:166, and
gpuCTPF's U==0 buffer guards, modelutils.jl:483-493)."""

import numpy as np
import pytest

import topicmodelsvb_jl_tpu as tm
from topicmodelsvb_jl_tpu.api import CTM, CTPF, DTM, LDA, fCTM, fLDA
from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh
from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig


def _rt():
    return RuntimeConfig(chunk_docs=8, dtype="float64", pad_multiple=8)


def _mesh():
    return make_mesh(n_devices=1)


@pytest.mark.parametrize("cls", [LDA, fLDA, CTM, fCTM])
def test_k1_single_doc(cls):
    """K=1 and a one-document corpus must train without crashing."""
    corp = tm.Corpus(docs=[tm.Document(terms=[1, 2, 3], counts=[2, 1, 1])],
                     vocab={1: "a", 2: "b", 3: "c"})
    m = cls(corp, 1, runtime=_rt(), mesh=_mesh())
    m.train(iter=3, checkelbo=1, printelbo=False, niter=20)
    assert np.isfinite(m.elbo)
    td = m.topicdist(1)
    assert td.shape == (1,) and np.isclose(float(td.sum()), 1.0)


@pytest.mark.parametrize("cls", [LDA, CTM])
def test_empty_doc_in_corpus(cls):
    """A zero-token document must not poison any statistic or the ELBO."""
    docs = [tm.Document(terms=[1, 2], counts=[2, 1]),
            tm.Document(),                       # empty
            tm.Document(terms=[2, 3], counts=[1, 3])]
    corp = tm.Corpus(docs=docs, vocab={1: "a", 2: "b", 3: "c"})
    m = cls(corp, 2, runtime=_rt(), mesh=_mesh())
    m.train(iter=4, checkelbo=1, printelbo=False, niter=20)
    assert np.isfinite(m.elbo)
    deltas = [r.delta_elbo for r in m.trainer.trace if r.delta_elbo is not None]
    assert all(d > -1e-6 for d in deltas[1:])


def test_all_empty_corpus_zeroes_iterations():
    """Reference: an all-empty corpus zeroes the iteration count
    (LDA.jl:166) instead of crashing."""
    corp = tm.Corpus(docs=[tm.Document(), tm.Document()], vocab={1: "a"})
    m = LDA(corp, 2, runtime=_rt(), mesh=_mesh())
    m.train(iter=10, checkelbo=1, printelbo=False)
    assert len(m.trainer.trace) == 0


def test_ctpf_single_reader_and_k1():
    corp = tm.Corpus(
        docs=[tm.Document(terms=[1, 2], counts=[1, 1], readers=[1],
                          ratings=[1]),
              tm.Document(terms=[2, 3], counts=[2, 1], readers=[1],
                          ratings=[2])],
        vocab={1: "a", 2: "b", 3: "c"}, users={1: "u"})
    m = CTPF(corp, 1, runtime=_rt(), mesh=_mesh())
    m.train(iter=3, checkelbo=1, printelbo=False)
    assert np.isfinite(m.elbo)
    assert m.drecs[0] == [] or isinstance(m.drecs[0], (list, tuple))


def test_dtm_single_slice():
    """All stamps in one window ⇒ T=1: the smoother degenerates to a
    single static slice and must still train."""
    docs = [tm.Document(terms=[1, 2], counts=[1, 1], stamp=0.1),
            tm.Document(terms=[2, 3], counts=[2, 1], stamp=0.2),
            tm.Document(terms=[1, 3], counts=[1, 2], stamp=0.3)]
    corp = tm.Corpus(docs=docs, vocab={1: "a", 2: "b", 3: "c"})
    m = DTM(corp, 2, delta=5.0, runtime=_rt(), mesh=_mesh())
    assert m.T == 1
    m.train(iter=3, checkelbo=1, printelbo=False, cgiter=3)
    assert np.isfinite(m.elbo)


def test_single_token_vocab():
    """V=1: every distribution collapses to a point; must stay finite."""
    corp = tm.Corpus(docs=[tm.Document(terms=[1], counts=[4]),
                           tm.Document(terms=[1], counts=[2])],
                     vocab={1: "only"})
    m = LDA(corp, 2, runtime=_rt(), mesh=_mesh())
    m.train(iter=3, checkelbo=1, printelbo=False)
    assert np.isfinite(m.elbo)
    np.testing.assert_allclose(np.asarray(m.beta), 1.0)


def test_vocab_of_one():
    """V=1: every token is the same term — beta is a [K,1] all-ones
    stochastic matrix; nothing may divide by zero or emit NaN."""
    docs = [tm.Document(terms=[1], counts=[5]),
            tm.Document(terms=[1], counts=[2])]
    corp = tm.Corpus(docs=docs, vocab={1: "only"})
    m = LDA(corp, 2, runtime=_rt(), mesh=_mesh())
    m.train(iter=3, checkelbo=1, printelbo=False)
    assert np.isfinite(m.elbo)
    assert np.allclose(np.asarray(m.beta).sum(axis=1), 1.0)


def test_huge_counts():
    """Counts of ~1e4 stress CTPF's E[log y!] handling and everyone's
    f64 accumulation — bounds must stay finite."""
    rng = np.random.default_rng(0)
    docs = []
    for _ in range(8):
        terms = list(rng.choice(np.arange(1, 13), size=6, replace=False))
        counts = [int(c) for c in rng.integers(1, 10_000, size=6)]
        readers = [int(r) for r in rng.choice(np.arange(1, 5), 2, replace=False)]
        docs.append(tm.Document(terms=terms, counts=counts,
                                readers=readers, ratings=[1, 1]))
    corp = tm.Corpus(docs=docs, vocab={j: f"w{j}" for j in range(1, 13)},
                     users={u: f"u{u}" for u in range(1, 5)})
    for cls in (LDA, CTPF):
        m = cls(corp, 2, runtime=_rt(), mesh=_mesh())
        m.train(iter=3, checkelbo=1, printelbo=False)
        assert np.isfinite(m.elbo), cls.__name__


def test_single_very_long_doc():
    """One 2,000-token doc (L far above the usual bucket) through the
    packed path; gamma mass must equal alpha + doc length."""
    rng = np.random.default_rng(1)
    terms = [int(t) for t in rng.integers(1, 40, size=2000)]
    corp = tm.Corpus(docs=[tm.Document(terms=terms, counts=[1] * 2000)],
                     vocab={j: f"w{j}" for j in range(1, 40)})
    tm.condense_corp(corp)
    tm.compact_corp(corp)
    m = LDA(corp, 3, runtime=_rt(), mesh=_mesh())
    m.train(iter=3, checkelbo=1, printelbo=False)
    assert np.isfinite(m.elbo)
    # gamma = alpha_at_update + Σ phi·counts, so its mass exceeds the
    # token count by the (positive) alpha mass
    g = np.asarray(m.gamma)
    assert g.sum() > 2000 and np.all(g > 0)
    td = m.topicdist(1)
    assert np.isclose(float(np.sum(td)), 1.0)


def _small_corp(seed=0, V=12, M=10):
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(M):
        terms = list(rng.choice(np.arange(1, V + 1), size=6, replace=False))
        counts = [int(c) for c in rng.integers(1, 5, size=6)]
        docs.append(tm.Document(terms=terms, counts=counts))
    return tm.Corpus(docs=docs, vocab={j: f"w{j}" for j in range(1, V + 1)})


def test_lda_survives_huge_alpha():
    """The reference's todo.txt:22 admits large alpha overflows its
    update_Elogtheta!/update_alpha!; here Elogtheta goes through the
    asymptotic-series digamma (digamma(x) ~ log x for huge x) and the
    mean-form Newton, so an absurd prior must train finitely and the
    Newton must contract it back toward the data."""
    corp = _small_corp(seed=3)
    m = LDA(corp, 3, runtime=_rt(), mesh=_mesh())
    m.state = m.state._replace(
        alpha=np.full(3, 1e12, dtype=np.float64))
    m.train(iter=5, checkelbo=1, printelbo=False)
    assert np.isfinite(m.elbo)
    assert np.all(np.isfinite(m.alpha)) and np.all(m.alpha > 0)
    assert np.all(np.isfinite(m.Elogtheta))
    assert np.all(np.isfinite(m.beta)) and np.all(np.isfinite(m.gamma))


def test_ctm_survives_large_mu():
    """The reference's todo.txt:8/11 admit large mu overflows its
    update_lambda! (Inf gradient → NaN poisons EVERY parameter); here
    the Newtons' exp boundary is clamped (ops/newton._exp_safe), so mu
    pushed past f64 exp-overflow keeps every Gaussian-channel parameter
    finite, and a topic the prior kills outright (zero phi mass for
    every document) renormalises to the uniform row (_beta_rows) instead
    of the 0/0 = NaN that would poison every OTHER topic's phi via
    log(beta) on the next sweep."""
    corp = _small_corp(seed=4)
    m = CTM(corp, 3, runtime=_rt(), mesh=_mesh())
    # exp(mu) would overflow f64 near 710; ±800 is past that
    m.state = m.state._replace(
        mu=np.array([800.0, -800.0, 0.0], dtype=np.float64))
    m.train(iter=5, checkelbo=1, printelbo=False, niter=30)
    s = m.state
    for name in ("mu", "sigma", "invsigma", "lam", "vsq", "logzeta"):
        assert np.all(np.isfinite(np.asarray(getattr(s, name)))), name
    beta = np.asarray(m.beta)
    assert np.all(np.isfinite(beta))
    np.testing.assert_allclose(beta.sum(axis=1), 1.0, rtol=1e-9)
    assert np.isfinite(m.elbo)


def test_ctm_invsigma_corruption_rejected():
    """check_model requires invsigma finite — the gap the reference's
    own todo.txt:7 admits its check_model leaves open."""
    from topicmodelsvb_jl_tpu.api import TopicModelError
    from topicmodelsvb_jl_tpu.validate import check_model

    corp = _small_corp(seed=5)
    m = CTM(corp, 3, runtime=_rt(), mesh=_mesh())
    bad = np.asarray(m.state.invsigma).copy()
    bad[0, 0] = np.inf
    m.state = m.state._replace(invsigma=bad)
    with pytest.raises(TopicModelError):
        check_model(m)
