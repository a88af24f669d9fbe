"""Packing tests: padded slots must be exactly invisible to statistics."""

import numpy as np
import pytest

from topicmodelsvb_jl_tpu.datasets import synth_corpus
from topicmodelsvb_jl_tpu.ops.packing import pack_corpus


def test_pack_shapes_and_masks():
    corp = synth_corpus(M=10, V=20, K=2, U=5, seed=1, mean_terms=6, mean_tokens=9,
                        mean_readers=2)
    p = pack_corpus(corp, pad_multiple=8, docs_multiple=16, with_readers=True)
    assert p.M == 10 and p.M_pad == 16
    assert p.terms.shape == p.counts.shape == (16, p.L)
    assert p.L % 8 == 0
    assert p.doc_mask[:10].all() and not p.doc_mask[10:].any()
    # padded rows are all-zero counts
    assert p.counts[10:].sum() == 0
    # real rows reproduce the ragged docs
    for d, doc in enumerate(corp.docs):
        n = len(doc.terms)
        np.testing.assert_array_equal(p.terms[d, :n], np.array(doc.terms) - 1)
        np.testing.assert_array_equal(p.counts[d, :n], doc.counts)
        assert p.counts[d, n:].sum() == 0
        r = len(doc.readers)
        np.testing.assert_array_equal(p.readers[d, :r], np.array(doc.readers) - 1)
        assert p.ratings[d, r:].sum() == 0
    assert p.C[:10].sum() == sum(doc.size for doc in corp.docs)


def test_chunked_view():
    corp = synth_corpus(M=10, V=20, K=2, seed=2, mean_terms=5, mean_tokens=8)
    p = pack_corpus(corp, pad_multiple=8, docs_multiple=16)
    ch = p.chunked(4)
    assert ch["terms"].shape == (4, 4, p.L)
    np.testing.assert_array_equal(ch["terms"].reshape(16, p.L), p.terms)


def test_bucketize_roundtrip_and_widths():
    """Every doc appears exactly once at its (shorter) segment width."""
    import numpy as np

    from topicmodelsvb_jl_tpu.ops.packing import PackedCorpus, bucketize_packed

    rng = np.random.default_rng(0)
    M, V, L = 100, 50, 64
    N = np.clip(rng.poisson(20, M), 2, L).astype(np.int32)
    terms = np.zeros((M, L), np.int32)
    counts = np.zeros((M, L), np.float32)
    for d in range(M):
        terms[d, :N[d]] = rng.integers(0, V, N[d])
        counts[d, :N[d]] = 1 + rng.poisson(0.3, N[d])
    p = PackedCorpus(terms=terms, counts=counts,
                     doc_mask=np.ones(M, np.float32), N=N, C=counts.sum(1),
                     M=M, V=V, L=L, max_count=3)
    bp = bucketize_packed(p, chunk=8, n_shards=2, pad_multiple=8)

    assert max(s.L for s in bp.segments) <= L
    local = bp.M_pad // 2
    seen = np.zeros(M, bool)
    for seg in bp.segments:
        for row in range(seg.terms.shape[0]):
            if seg.doc_mask[row] <= 0:
                assert seg.counts[row].sum() == 0
                continue
            s, lr = divmod(row, seg.n_local)
            prow = s * local + seg.loc_start + lr
            (o,) = np.nonzero(bp.inv_order == prow)[0]
            n = N[o]
            assert np.array_equal(seg.terms[row, :n], terms[o, :n])
            assert np.array_equal(seg.counts[row, :n], counts[o, :n])
            assert np.array_equal(bp.terms[prow, :n], terms[o, :n])
            seen[o] = True
    assert seen.all()


def test_lda_bucketed_matches_dense():
    """Bucketed LDA training equals dense training (doc updates are
    independent within an outer sweep; only reduction order differs)."""
    import numpy as np

    import topicmodelsvb_jl_tpu as tm
    import topicmodelsvb_jl_tpu.api as apimod

    corp = tm.synth_corpus(M=120, V=60, K=3, seed=2)
    m_b = tm.LDA(corp, 3, seed=4)
    assert m_b.packed.segments is not None

    class LDAPlain(apimod.LDA):
        _bucketed = False

    m_d = LDAPlain(corp, 3, seed=4)
    m_b.train(iter=5, checkelbo=5, printelbo=False)
    m_d.train(iter=5, checkelbo=5, printelbo=False)
    np.testing.assert_allclose(m_b.beta, m_d.beta, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(m_b.gamma, m_d.gamma, rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(m_b.elbo, m_d.elbo, rtol=1e-4)
    # topicdist consistency through the permutation
    td = m_b.topicdist(list(range(1, corp.shape[0] + 1)))
    np.testing.assert_allclose(np.sum(td, axis=1), 1.0, rtol=1e-5)


def test_ctm_bucketed_matches_dense():
    import numpy as np

    import topicmodelsvb_jl_tpu as tm
    import topicmodelsvb_jl_tpu.api as apimod

    corp = tm.synth_corpus(M=100, V=50, K=3, seed=6)
    m_b = tm.CTM(corp, 3, seed=4)
    assert m_b.packed.segments is not None

    class CTMPlain(apimod.CTM):
        _bucketed = False

    m_d = CTMPlain(corp, 3, seed=4)
    m_b.train(iter=4, checkelbo=4, printelbo=False)
    m_d.train(iter=4, checkelbo=4, printelbo=False)
    np.testing.assert_allclose(m_b.beta, m_d.beta, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(m_b.lam, m_d.lam, rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(m_b.elbo, m_d.elbo, rtol=1e-4)


def test_pack_corpus_native_fastpath_matches_loop():
    """The f32 native fill (tmvb_fill_dense) must produce byte-identical
    packed arrays to the per-doc Python loop (the f64 path)."""
    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu.ops.packing import pack_corpus

    corp = tm.synth_corpus(M=37, V=40, K=3, seed=2, mean_terms=9)
    corp.docs[3].terms, corp.docs[3].counts = [], []     # empty doc
    f32 = pack_corpus(corp, pad_multiple=8, docs_multiple=8,
                      dtype=np.float32)
    f64 = pack_corpus(corp, pad_multiple=8, docs_multiple=8,
                      dtype=np.float64)
    np.testing.assert_array_equal(f32.terms, f64.terms)
    np.testing.assert_array_equal(f32.counts, f64.counts.astype(np.float32))
    np.testing.assert_array_equal(f32.doc_mask, f64.doc_mask.astype(np.float32))
    assert (f32.M, f32.V, f32.L, f32.max_count) == \
        (f64.M, f64.V, f64.L, f64.max_count)


def test_trim_packed_rekeys_and_roundtrips(tmp_path):
    """trim_packed (the PackedCorpus analogue of fixcorp trim=True,
    Corpus.jl:641-652; a Corpus can never hold sparse ids — check_corp
    enforces condensed keys — so the packed level is where trimming is
    needed): re-keys the used ids densely, maps back via used_ids, and
    training on the trimmed corpus equals training on the equivalent
    condensed packing."""
    import dataclasses

    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu.ops.packing import (load_packed, save_packed,
                                                  trim_packed)

    corp = tm.synth_corpus(M=80, V=25, K=3, seed=3, mean_terms=12)
    dense = pack_corpus(corp, pad_multiple=8, docs_multiple=8)
    live = dense.counts > 0
    assert len(np.unique(dense.terms[live])) == 25  # every id used (seed scanned)
    # sparsify the id space 7x: the scenario trim_packed exists for
    sparse_terms = np.where(live, dense.terms * 7 + 3, 0).astype(np.int32)
    sparse = dataclasses.replace(dense, terms=sparse_terms, V=25 * 7 + 3)

    trimmed, used = trim_packed(sparse)
    assert trimmed.V == len(used) == 25 < sparse.V
    # new → old round-trip on real slots; padding stays id 0 / count 0
    np.testing.assert_array_equal(used[trimmed.terms[live]],
                                  sparse.terms[live])
    assert (trimmed.terms[~live] == 0).all()
    # dense ascending re-key ⇒ identical to the condensed packing
    np.testing.assert_array_equal(trimmed.terms, dense.terms)
    np.testing.assert_array_equal(trimmed.counts, dense.counts)

    # memmapped corpora trim without full materialization, in row
    # chunks smaller than the corpus
    save_packed(str(tmp_path / "p"), sparse)
    disk = load_packed(str(tmp_path / "p"))
    assert isinstance(disk.terms, np.memmap)
    t2, used2 = trim_packed(disk, chunk_rows=8)
    np.testing.assert_array_equal(t2.terms, trimmed.terms)
    np.testing.assert_array_equal(used2, used)

    # training on trimmed == training on the condensed packing (same
    # arrays in, same trajectory out), and beta expands back
    rt = tm.RuntimeConfig(chunk_docs=8, pad_multiple=8)
    mt = tm.LDA(trimmed, 3, seed=1, runtime=rt)
    md = tm.LDA(dense, 3, seed=1, runtime=rt)
    mt.train(iter=3, checkelbo=1, tol=0.0, printelbo=False)
    md.train(iter=3, checkelbo=1, tol=0.0, printelbo=False)
    np.testing.assert_array_equal(np.asarray(mt.beta), np.asarray(md.beta))
    np.testing.assert_allclose(mt.elbo, md.elbo, rtol=0)
    beta_full = np.zeros((3, sparse.V))
    beta_full[:, used] = mt.beta
    np.testing.assert_allclose(beta_full[:, used].sum(1), 1.0, rtol=1e-5)


def test_trim_packed_users_axis():
    """users=True re-keys the reader axis too (CTPF's [K, U] state;
    reference trimcorp! users half, Corpus.jl:647-651) and CTPF trains
    on the trimmed corpus with recs expanding back."""
    import dataclasses

    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu.ops.packing import trim_packed

    corp = tm.synth_corpus(M=48, V=30, K=3, U=16, seed=6, mean_readers=3)
    dense = pack_corpus(corp, pad_multiple=8, docs_multiple=8,
                        with_readers=True)
    rlive = dense.ratings > 0
    sparse = dataclasses.replace(
        dense,
        readers=np.where(rlive, dense.readers * 9 + 2, 0).astype(np.int32),
        U=16 * 9 + 2)
    trimmed, used_v, used_u = trim_packed(sparse, users=True)
    assert trimmed.U == len(used_u) <= 16
    np.testing.assert_array_equal(used_u[trimmed.readers[rlive]],
                                  sparse.readers[rlive])
    assert (trimmed.readers[~rlive] == 0).all()
    # terms untouched by construction here (already dense)
    assert trimmed.V == dense.V

    m = tm.CTPF(trimmed, 3, seed=1,
                runtime=tm.RuntimeConfig(chunk_docs=8, pad_multiple=8))
    m.train(iter=3, checkelbo=1, printelbo=False)
    assert np.isfinite(m.elbo)
    assert len(m.urecs[0]) > 0

    with pytest.raises(ValueError):
        trim_packed(pack_corpus(corp, pad_multiple=8, docs_multiple=8),
                    users=True)
