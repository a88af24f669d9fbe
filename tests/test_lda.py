"""LDA correctness: oracle parity, ELBO monotonicity, determinism,
shard-count equivalence (SURVEY §4 test pyramid)."""

import numpy as np
import pytest

import topicmodelsvb_jl_tpu as tm
from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig

from oracle import LDAOracle, docs_from_corpus


def _make_lda(corp, K, n_devices=None, dtype="float64", chunk=8, seed=3):
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices=n_devices)
    rt = RuntimeConfig(chunk_docs=chunk, dtype=dtype, pad_multiple=8)
    return tm.LDA(corp, K, runtime=rt, mesh=mesh, seed=seed)


def test_lda_matches_cpu_oracle(tiny_corpus):
    """Batch-synchronous TPU schedule reproduces the reference CPU
    per-doc sweep exactly (beta/alpha only change post-sweep)."""
    K, iters = 4, 5
    model = _make_lda(tiny_corpus, K)
    beta0 = np.asarray(model.state.beta, np.float64)

    oracle = LDAOracle(docs_from_corpus(tiny_corpus), V=tiny_corpus.shape[1],
                       K=K, beta0=beta0)
    oracle_elbos = oracle.train(iters)

    model.train(iter=iters, checkelbo=1, printelbo=False)

    np.testing.assert_allclose(model.beta, oracle.beta, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(model.alpha, oracle.alpha, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        model.gamma, np.stack(oracle.gamma), rtol=1e-7, atol=1e-9
    )
    traced = [r.elbo for r in model.trainer.trace if r.elbo is not None]
    np.testing.assert_allclose(traced, oracle_elbos, rtol=1e-8)


def test_lda_elbo_monotone(tiny_corpus):
    model = _make_lda(tiny_corpus, K=5)
    model.train(iter=15, checkelbo=1, printelbo=False)
    deltas = [r.delta_elbo for r in model.trainer.trace if r.delta_elbo is not None]
    # CAVI guarantees a nondecreasing bound.  deltas[0] is vs the
    # reference's initial elbo=0 (the bound itself, negative), so
    # monotonicity starts at deltas[1]; the length guard keeps the
    # assertion from passing vacuously if tracing regresses.
    assert len(deltas) >= 10
    assert all(d > -1e-6 for d in deltas[1:])


def test_lda_deterministic(tiny_corpus):
    m1 = _make_lda(tiny_corpus, K=4, seed=9)
    m2 = _make_lda(tiny_corpus, K=4, seed=9)
    m1.train(iter=3, checkelbo=np.inf, printelbo=False)
    m2.train(iter=3, checkelbo=np.inf, printelbo=False)
    assert np.array_equal(m1.beta, m2.beta)  # bitwise
    assert np.array_equal(m1.gamma, m2.gamma)


def test_lda_shard_equivalence(tiny_corpus):
    """1-device vs 8-device mesh: psum'd sufficient statistics must match
    the serial accumulation (the analogue of LDA.jl:129-132)."""
    m1 = _make_lda(tiny_corpus, K=4, n_devices=1, seed=3)
    m8 = _make_lda(tiny_corpus, K=4, n_devices=8, seed=3)
    np.testing.assert_array_equal(np.asarray(m1.state.beta), np.asarray(m8.state.beta))
    m1.train(iter=4, checkelbo=1, printelbo=False)
    m8.train(iter=4, checkelbo=1, printelbo=False)
    np.testing.assert_allclose(m1.beta, m8.beta, rtol=1e-9)
    np.testing.assert_allclose(m1.alpha, m8.alpha, rtol=1e-8)
    np.testing.assert_allclose(m1.elbo, m8.elbo, rtol=1e-9)


def test_lda_float32_runs(tiny_corpus):
    model = _make_lda(tiny_corpus, K=4, dtype="float32")
    model.train(iter=3, checkelbo=1, printelbo=False)
    assert np.isfinite(model.elbo)
    assert np.allclose(model.beta.sum(axis=1), 1.0, atol=1e-4)


def test_lda_topicdist_and_topics(tiny_corpus):
    model = _make_lda(tiny_corpus, K=4)
    model.train(iter=2, checkelbo=np.inf, printelbo=False)
    td = model.topicdist(1)
    assert td.shape == (4,) and np.isclose(td.sum(), 1.0)
    tds = model.topicdist([1, 2, 3])
    assert tds.shape == (3, 4)
    assert model.topics.shape == (4, tiny_corpus.shape[1])
    # 1-based vocab keys, each row a permutation
    assert sorted(model.topics[0].tolist()) == list(range(1, tiny_corpus.shape[1] + 1))
    with pytest.raises(tm.CorpusError):
        model.topicdist(len(tiny_corpus) + 1)


def test_lda_showtopics_smoke(tiny_corpus, capsys):
    model = _make_lda(tiny_corpus, K=4)
    model.train(iter=1, checkelbo=np.inf, printelbo=False)
    model.showtopics(V=5, cols=2)
    out = capsys.readouterr().out
    assert "topic 1" in out and "topic 4" in out


def test_train_argument_validation(tiny_corpus):
    model = _make_lda(tiny_corpus, K=3)
    with pytest.raises(ValueError):
        model.train(iter=-1)
    with pytest.raises(ValueError):
        model.train(tol=-0.5)
    with pytest.raises(ValueError):
        model.train(checkelbo=0)
    with pytest.raises(ValueError):
        tm.LDA(tiny_corpus, 0)


@pytest.mark.slow
def test_reference_tol_semantics_reachable_f64():
    """The reference's default early stop (tol=1.0, LDA.jl:161,
    checkelbo=1) must fire GENUINELY on the f64 path: monotone decaying
    ∆elbo, no negative deltas, termination before the iteration cap —
    reachable only with the compensated (hi, lo) bound accumulation
    (utils/numerics.py) once the corpus bound dwarfs the f32 ulp.
    The full-scale demonstrations live in RESULTS.md (f64 at
    M=8192/V=8192/K=50 stops at iter 439; f32 at NSF scale stops at the
    training-arithmetic noise floor instead)."""
    import topicmodelsvb_jl_tpu as tm

    corp = tm.synth_corpus(768, 384, K=10, seed=7, mean_tokens=50,
                           mean_terms=35)
    rt = RuntimeConfig(chunk_docs=64, dtype="float64", pad_multiple=8)
    m = tm.LDA(corp, 10, runtime=rt, seed=7)
    m.train(iter=400, tol=1.0, checkelbo=1, printelbo=False)
    ds = [r.delta_elbo for r in m.trainer.trace if r.delta_elbo is not None]
    assert len(m.trainer.trace) < 400, "must terminate via the early stop"
    assert ds[-1] < 1.0
    assert all(d >= 0 for d in ds), "trace must be monotone"
    # decay (not noise-crossing): the last delta is also the smallest
    assert ds[-1] == min(ds)


def test_elogtheta_f64_channel_tracks_f32(tiny_corpus):
    """RuntimeConfig.elogtheta_f64 promotes only the per-doc digamma
    channel; the trajectory must stay within f32 tolerance of the plain
    path while the states differ (the channel really changed)."""
    import jax.numpy as jnp
    from topicmodelsvb_jl_tpu.models import lda as lda_mod
    from topicmodelsvb_jl_tpu.ops.packing import pack_corpus

    K = 3
    packed = pack_corpus(tiny_corpus, pad_multiple=8, docs_multiple=8)
    data = (jnp.asarray(packed.terms),
            jnp.asarray(packed.counts.astype(np.float32)),
            jnp.asarray(packed.doc_mask.astype(np.float32)),
            jnp.asarray(float(packed.M), jnp.float32))
    kw = dict(viter=4, vtol=1.0 / K**2, niter=50, ntol=1.0 / K**2,
              chunk_docs=8, axis_name=None, use_pallas=False)
    outs = {}
    for knob in (False, True):
        import jax
        st = lda_mod.init(jax.random.PRNGKey(0), packed, K, jnp.float32)
        step = jax.jit(lda_mod.make_step(packed, K, elogtheta_f64=knob, **kw))
        for _ in range(3):
            st = step(st, *data)
        outs[knob] = st
    np.testing.assert_allclose(np.asarray(outs[True].beta),
                               np.asarray(outs[False].beta),
                               rtol=2e-4, atol=1e-7)
    assert not np.array_equal(np.asarray(outs[True].Elogtheta),
                              np.asarray(outs[False].Elogtheta))


def test_elbo_gather_direct_matches_combined_table(tiny_corpus):
    """The large-V gather-direct ELBO (no [V, 2K] combined table) must
    agree with the default combined-table pass."""
    import jax
    import jax.numpy as jnp
    from topicmodelsvb_jl_tpu.models import lda as lda_mod
    from topicmodelsvb_jl_tpu.ops.packing import pack_corpus
    from topicmodelsvb_jl_tpu.utils.numerics import elbo_value

    K = 3
    packed = pack_corpus(tiny_corpus, pad_multiple=8, docs_multiple=8,
                         dtype=np.float64)
    data = (jnp.asarray(packed.terms),
            jnp.asarray(packed.counts.astype(np.float64)),
            jnp.asarray(packed.doc_mask.astype(np.float64)),
            jnp.asarray(float(packed.M), jnp.float64))
    st = lda_mod.init(jax.random.PRNGKey(0), packed, K, jnp.float64)
    step = jax.jit(lda_mod.make_step(
        packed, K, viter=4, vtol=1.0 / K**2, niter=50, ntol=1.0 / K**2,
        chunk_docs=8, axis_name=None, use_pallas=False))
    for _ in range(2):
        st = step(st, *data)
    vals = []
    for gd in (False, True):
        e = jax.jit(lda_mod.make_elbo(packed, K, chunk_docs=8,
                                      gather_direct=gd))
        vals.append(elbo_value(e(st, *data[:3])))
    np.testing.assert_allclose(vals[1], vals[0], rtol=1e-12)
