"""Pallas kernel equivalence tests (interpret mode on CPU).

The fused E-step kernel must compute the same math as the pure-XLA
fixpoint path (models/lda.py:_estep_chunk) — the reference's own
CPU-vs-GPU relationship, where tolerance (not bitwise) agreement is the
criterion because the two paths order float ops differently
(LDA.jl:14-21 vs gpuLDA.jl:14-21).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topicmodelsvb_jl_tpu.utils.numerics import elbo_value

from topicmodelsvb_jl_tpu.kernels.lda_estep import digamma_series, lda_estep
from topicmodelsvb_jl_tpu.models import lda as lda_mod
from topicmodelsvb_jl_tpu.ops.packing import PackedCorpus


def _small_packed(M=32, V=64, L=32, seed=3):
    rng = np.random.default_rng(seed)
    terms = rng.integers(0, V, size=(M, L)).astype(np.int32)
    counts = (1 + rng.poisson(0.4, size=(M, L))).astype(np.float32)
    n = rng.integers(4, L, size=M)
    valid = np.arange(L)[None, :] < n[:, None]
    counts *= valid
    terms *= valid
    dm = np.ones(M, np.float32)
    dm[-3:] = 0.0  # padded docs
    counts[-3:] = 0.0
    return PackedCorpus(
        terms=terms, counts=counts, doc_mask=dm, N=n.astype(np.int32),
        C=counts.sum(1), M=M - 3, V=V, L=L, max_count=int(counts.max()),
    )


def test_digamma_series_matches_lax():
    x = jnp.asarray(
        np.concatenate([np.linspace(1e-3, 0.9, 50),
                        np.linspace(1.0, 50.0, 50),
                        np.linspace(100.0, 5e4, 20)]).astype(np.float32))
    got = digamma_series(x)
    want = jax.lax.digamma(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("K", [7, 16])
def test_lda_estep_kernel_matches_xla(K):
    packed = _small_packed()
    state = lda_mod.init(jax.random.PRNGKey(0), packed, K, jnp.float32)
    data = (
        jnp.asarray(packed.terms), jnp.asarray(packed.counts),
        jnp.asarray(packed.doc_mask), jnp.asarray(float(packed.M), jnp.float32),
    )
    kw = dict(viter=6, vtol=1.0 / K**2, niter=50, ntol=1.0 / K**2,
              chunk_docs=16, axis_name=None)
    step_x = jax.jit(lda_mod.make_step(packed, K, use_pallas=False, **kw))
    step_p = jax.jit(lda_mod.make_step(packed, K, use_pallas=True,
                                       pallas_interpret=True, **kw))
    sx, sp = state, state
    for _ in range(3):  # a few outer iterations so differences compound
        sx = step_x(sx, *data)
        sp = step_p(sp, *data)
    for f in ("alpha", "beta", "gamma", "Elogtheta"):
        a = np.asarray(getattr(sx, f))
        b = np.asarray(getattr(sp, f))
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5,
                                   err_msg=f"{f} diverged")


def test_lda_estep_padded_doc_rows_frozen():
    """Padded documents (mask 0) must keep their incoming state."""
    K = 8
    packed = _small_packed()
    state = lda_mod.init(jax.random.PRNGKey(0), packed, K, jnp.float32)
    Kp = 128
    padk = lambda a: jnp.pad(jnp.asarray(a), ((0, 0), (0, Kp - K)))
    betaT_p = jnp.pad(state.beta.T + 1e-30, ((0, 0), (0, Kp - K)))
    bd = betaT_p[jnp.asarray(packed.terms)]
    g, el, elo, w = lda_estep(
        bd, jnp.asarray(packed.counts), jnp.asarray(packed.doc_mask),
        jnp.pad(state.alpha, (0, Kp - K)),
        padk(state.gamma), padk(state.Elogtheta), padk(state.Elogtheta_old),
        viter=4, vtol=1e-6, n_topics=K, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(g)[-3:, :K],
                                  np.asarray(state.gamma)[-3:])
    np.testing.assert_array_equal(np.asarray(el)[-3:, :K],
                                  np.asarray(state.Elogtheta)[-3:])
    assert np.all(np.asarray(w)[-3:] == 0.0)


@pytest.mark.parametrize("K", [7, 16])
def test_flda_estep_kernel_matches_xla(K):
    from topicmodelsvb_jl_tpu.models import flda as flda_mod

    packed = _small_packed()
    state = flda_mod.init(jax.random.PRNGKey(1), packed, K, jnp.float32)
    data = (
        jnp.asarray(packed.terms), jnp.asarray(packed.counts),
        jnp.asarray(packed.doc_mask),
        jnp.asarray(float(packed.M), jnp.float32),
        jnp.asarray(float(packed.C.sum()), jnp.float32),
    )
    kw = dict(viter=6, vtol=1.0 / K**2, niter=50, ntol=1.0 / K**2,
              chunk_docs=16, axis_name=None)
    step_x = jax.jit(flda_mod.make_step(packed, K, use_pallas=False, **kw))
    step_p = jax.jit(flda_mod.make_step(packed, K, use_pallas=True,
                                        pallas_interpret=True, **kw))
    sx, sp = state, state
    for _ in range(3):
        sx = step_x(sx, *data)
        sp = step_p(sp, *data)
    for f in ("alpha", "beta", "kappa", "gamma", "Elogtheta", "tau", "eta"):
        np.testing.assert_allclose(
            np.asarray(getattr(sx, f)), np.asarray(getattr(sp, f)),
            rtol=5e-3, atol=1e-5, err_msg=f"{f} diverged")


def test_ctpf_estep_kernel_matches_xla():
    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu.models import ctpf as ctpf_mod
    from topicmodelsvb_jl_tpu.ops.packing import pack_corpus

    K = 9
    corp = tm.synth_corpus(M=48, V=60, K=4, U=20, seed=5,
                           mean_terms=12, mean_tokens=20)
    packed = pack_corpus(corp, pad_multiple=8, docs_multiple=16,
                         with_readers=True)
    state = ctpf_mod.init(jax.random.PRNGKey(2), packed, K, jnp.float32)
    data = (jnp.asarray(packed.terms), jnp.asarray(packed.counts),
            jnp.asarray(packed.readers), jnp.asarray(packed.ratings),
            jnp.asarray(packed.doc_mask))
    kw = dict(viter=5, vtol=1.0 / K**2, chunk_docs=16, axis_name=None)
    step_x = jax.jit(ctpf_mod.make_step(packed, K, use_pallas=False, **kw))
    step_p = jax.jit(ctpf_mod.make_step(packed, K, use_pallas=True,
                                        pallas_interpret=True, **kw))
    sx, sp = state, state
    for _ in range(3):
        sx = step_x(sx, *data)
        sp = step_p(sp, *data)
    for f in ("alef", "bet", "gimel", "dalet", "he", "vav", "zayin", "het"):
        np.testing.assert_allclose(
            np.asarray(getattr(sx, f)), np.asarray(getattr(sp, f)),
            rtol=2e-2, atol=1e-5, err_msg=f"{f} diverged")


def test_alog_bits_matches_log():
    """The bitcast-based in-kernel log must be sub-ULP-accurate for the
    positive normals the ELBO kernel feeds it."""
    from topicmodelsvb_jl_tpu.kernels.lda_elbo import alog_bits

    r = np.random.default_rng(0)
    x = np.concatenate([r.uniform(1e-30, 1.0, 5000),
                        r.uniform(1.0, 1e4, 5000),
                        [1e-30, 1.0, 2.0, np.float32(np.finfo(np.float32).max)]
                        ]).astype(np.float32)
    got = np.asarray(alog_bits(jnp.asarray(x)), np.float64)
    want = np.log(x.astype(np.float64))
    eps32 = np.float64(np.finfo(np.float32).eps)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1.0)
    assert rel.max() < 2.0 * eps32


def test_lda_elbo_kernel_matches_xla_routed():
    """Routed vocab-TP ELBO: the fused kernel (local [V/n] tables, the
    token accumulator carrying Elogpz by linearity) must agree with the
    routed XLA pass — this is the production on-chip routed ELBO path."""
    from jax.sharding import PartitionSpec as P

    from topicmodelsvb_jl_tpu.ops.packing import route_packed
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh
    from topicmodelsvb_jl_tpu.parallel.shard import shard_map

    K = 16
    packed = _small_packed()
    routed = route_packed(packed, n_shards=4, pad_multiple=8)
    state = lda_mod.init(jax.random.PRNGKey(0), packed, K, jnp.float32)
    data = (
        jnp.asarray(packed.terms), jnp.asarray(packed.counts),
        jnp.asarray(packed.doc_mask),
        jnp.asarray(float(packed.M), jnp.float32),
    )
    step = jax.jit(lda_mod.make_step(
        packed, K, viter=6, vtol=1.0 / K**2, niter=50, ntol=1.0 / K**2,
        chunk_docs=16, axis_name=None, use_pallas=False))
    for _ in range(2):
        state = step(state, *data)

    mesh = make_mesh(axis_names=("data", "vocab"), shape=(2, 4))
    spec = lda_mod.partition_spec(data_axis="data", vocab_axis="vocab")
    tokspec, dspec = P("data", "vocab"), P("data")
    mk = lambda **kw: jax.jit(shard_map(
        lda_mod.make_elbo(routed, K, chunk_docs=16, axis_name="data",
                          vocab_axis="vocab", vocab_routed=True, **kw),
        mesh=mesh, in_specs=(spec, tokspec, tokspec, dspec),
        out_specs=P(), check_vma=False))
    rdata = (jnp.asarray(routed.terms), jnp.asarray(routed.counts),
             jnp.asarray(routed.doc_mask))
    a = elbo_value(mk(use_pallas=False)(state, *rdata))
    b = elbo_value(mk(use_pallas=True, pallas_interpret=True)(
        state, *rdata))
    assert abs(a - b) / abs(a) < 1e-5, (a, b)


@pytest.mark.parametrize("K", [7, 16])
def test_lda_elbo_kernel_matches_xla(K):
    """The fused ELBO kernel's bound must agree with the XLA pass."""
    packed = _small_packed()
    state = lda_mod.init(jax.random.PRNGKey(0), packed, K, jnp.float32)
    data = (
        jnp.asarray(packed.terms), jnp.asarray(packed.counts),
        jnp.asarray(packed.doc_mask), jnp.asarray(float(packed.M), jnp.float32),
    )
    step = jax.jit(lda_mod.make_step(
        packed, K, viter=6, vtol=1.0 / K**2, niter=50, ntol=1.0 / K**2,
        chunk_docs=16, axis_name=None, use_pallas=False))
    for _ in range(2):
        state = step(state, *data)
    ex = jax.jit(lda_mod.make_elbo(packed, K, chunk_docs=16, use_pallas=False))
    ep = jax.jit(lda_mod.make_elbo(packed, K, chunk_docs=16, use_pallas=True,
                                   pallas_interpret=True))
    a = elbo_value(ex(state, *data[:3]))
    b = elbo_value(ep(state, *data[:3]))
    assert abs(a - b) / abs(a) < 1e-5, (a, b)


@pytest.mark.parametrize("K", [7, 16])
def test_ctm_elbo_kernel_matches_xla(K):
    """CTM reuses lda_elbo_tok with (El, El_old) := (lambda, lambda_old);
    the bound must agree with CTM's XLA ELBO pass."""
    from topicmodelsvb_jl_tpu.models import ctm as ctm_mod

    packed = _small_packed()
    state = ctm_mod.init(jax.random.PRNGKey(0), packed, K, jnp.float32)
    data = (
        jnp.asarray(packed.terms), jnp.asarray(packed.counts),
        jnp.asarray(packed.doc_mask), jnp.asarray(float(packed.M), jnp.float32),
    )
    step = jax.jit(ctm_mod.make_step(
        packed, K, viter=4, vtol=1.0 / K**2, niter=20, ntol=1.0 / K**2,
        chunk_docs=16, axis_name=None, use_pallas=False))
    for _ in range(2):
        state = step(state, *data)
    ex = jax.jit(ctm_mod.make_elbo(packed, K, chunk_docs=16, use_pallas=False))
    ep = jax.jit(ctm_mod.make_elbo(packed, K, chunk_docs=16, use_pallas=True,
                                   pallas_interpret=True))
    a = elbo_value(ex(state, *data[:3]))
    b = elbo_value(ep(state, *data[:3]))
    assert abs(a - b) / abs(a) < 1e-5, (a, b)


