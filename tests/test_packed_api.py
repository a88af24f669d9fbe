"""PackedCorpus model-construction surface (api.TopicModel with packed
input): checkpoint round-trip, pre-bucketized input, degenerate guards."""

import numpy as np
import pytest

from topicmodelsvb_jl_tpu import checkpoint as ckptlib
from topicmodelsvb_jl_tpu.api import CTPF, DTM, LDA, TopicModelError
from topicmodelsvb_jl_tpu.datasets import synth_packed_nsf_scale
from topicmodelsvb_jl_tpu.ops.packing import bucketize_packed
from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh
from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig


def _rt(**kw):
    return RuntimeConfig(chunk_docs=8, dtype="float64", pad_multiple=8, **kw)


def test_packed_checkpoint_roundtrip(tmp_path):
    """save/load must round-trip for a PackedCorpus-built model: the
    fingerprint is taken from the PRE-bucketing object the user holds."""
    packed = synth_packed_nsf_scale(M=40, V=60, mean_terms=12, seed=3,
                                    chunk_docs=8)
    m = LDA(packed, 3, runtime=_rt(), mesh=make_mesh(n_devices=1), seed=2)
    m.train(iter=3, checkelbo=1, printelbo=False)
    path = str(tmp_path / "m.ckpt")
    ckptlib.save(path, m)
    m2 = ckptlib.load(path, packed)       # same pre-bucket object
    np.testing.assert_allclose(np.asarray(m2.beta), np.asarray(m.beta),
                               rtol=1e-12)
    # resume continues the trajectory identically
    m.train(iter=2, checkelbo=1, printelbo=False)
    m2.train(iter=2, checkelbo=1, printelbo=False)
    np.testing.assert_allclose(np.asarray(m2.beta), np.asarray(m.beta),
                               rtol=1e-10)


def test_prebucketized_packed_input_preserves_doc_stats():
    """N/C must be de-permuted when the input packed corpus was already
    bucketized (rows length-sorted and interleaved with padding)."""
    packed = synth_packed_nsf_scale(M=33, V=50, mean_terms=10, seed=5,
                                    chunk_docs=8)
    true_N = packed.N[:33].tolist()
    true_C = packed.C[:33].tolist()
    b = bucketize_packed(packed, chunk=8, n_shards=4)
    m = LDA(b, 3, runtime=_rt(), mesh=make_mesh(n_devices=4), seed=1)
    assert m.N == true_N
    assert m.C == true_C
    assert sum(m.C) == sum(true_C)


def test_packed_guards():
    packed = synth_packed_nsf_scale(M=16, V=40, mean_terms=8, seed=1,
                                    chunk_docs=8)
    # CTPF needs full reader arrays
    with pytest.raises(ValueError, match="reader arrays"):
        CTPF(packed, 3, runtime=_rt(), mesh=make_mesh(n_devices=1))
    # DTM needs stamps — clear error, not AttributeError
    with pytest.raises(TopicModelError, match="stamps"):
        DTM(packed, 3, delta=1.0, runtime=_rt(), mesh=make_mesh(n_devices=1))
    # corpus-text surfaces raise clearly
    m = LDA(packed, 3, runtime=_rt(), mesh=make_mesh(n_devices=1))
    with pytest.raises(TopicModelError, match="PackedCorpus"):
        m.showdocs(1)
    with pytest.raises(TopicModelError, match="PackedCorpus"):
        m.getusers()
    # showtopics works with placeholder names; gencorp synthesizes vocab
    m.train(iter=2, checkelbo=np.inf, printelbo=False)
    m.showtopics(V=3, cols=2)
    from topicmodelsvb_jl_tpu.api import gencorp

    corp = gencorp(m, M=4, seed=0)
    assert len(corp) == 4 and len(corp.vocab) == m.V


def test_prebucketized_shard_mismatch_rejected():
    """A bucketed corpus laid out for n_shards=S must be rejected by a
    model on a mesh with a different data-axis size — the shard-major
    rows would silently pair with the wrong per-doc state (regression)."""
    packed = synth_packed_nsf_scale(M=33, V=50, mean_terms=10, seed=5,
                                    chunk_docs=8)
    b = bucketize_packed(packed, chunk=8, n_shards=1)
    with pytest.raises(TopicModelError, match="n_shards"):
        LDA(b, 3, runtime=_rt(), mesh=make_mesh(n_devices=4), seed=1)


def test_dtm_basemodel_from_packed_corpus_checks_M():
    """basemodel built from a PackedCorpus (corp=None) must hit the clear
    doc-count TopicModelError, not AttributeError (regression)."""
    import topicmodelsvb_jl_tpu as tm

    packed = synth_packed_nsf_scale(M=16, V=20, mean_terms=6, seed=1,
                                    chunk_docs=8)
    base = LDA(packed, 2, runtime=_rt(), mesh=make_mesh(n_devices=1), seed=0)
    corp = tm.synth_corpus(M=20, V=20, K=2, seed=0, n_slices=2)
    with pytest.raises(TopicModelError, match="matching number"):
        DTM(corp, 2, delta=1.0, basemodel=base, runtime=_rt(),
            mesh=make_mesh(n_devices=1))
