"""Packing tests: padded slots must be exactly invisible to statistics."""

import numpy as np

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
