"""Checkpoint / resume.

The reference has none — "save/load trained models" is an open wish
(todo.txt item 5); its substitute is that every model struct is a plain
bag of arrays and ``train!`` is resumable by construction (all ``*_old``
fields live in the struct, LDA.jl:16-19).  Here both halves are
first-class:

* :func:`save` / :func:`load` serialise the full variational-state
  pytree plus metadata (model class, K, corpus fingerprint, seed,
  trained-elbo) to a single ``.npz``;
* because the state carries every ``*_old`` buffer, a loaded model's
  ``train()`` continues the ELBO trace exactly (tested in
  tests/test_checkpoint.py).
"""

from __future__ import annotations

import hashlib
import json
from typing import Tuple

import jax
import numpy as np

from .corpus import Corpus

_FORMAT_VERSION = 1


def packed_fingerprint(packed) -> str:
    """Stable hash of a PackedCorpus's device-facing arrays (used when a
    model was built directly from packed data, no Corpus available).
    Hash the same (pre- or post-bucketing) packed object on load."""
    h = hashlib.sha256()
    for a in (packed.terms, packed.counts, packed.readers, packed.ratings):
        if a is not None:
            h.update(np.ascontiguousarray(a).tobytes())
    return "packed:" + h.hexdigest()


def corpus_fingerprint(corp: Corpus) -> str:
    """Stable hash of the corpus contents (docs + vocab + users)."""
    h = hashlib.sha256()
    for doc in corp.docs:
        h.update(np.asarray(doc.terms, np.int64).tobytes())
        h.update(np.asarray(doc.counts, np.int64).tobytes())
        h.update(np.asarray(doc.readers, np.int64).tobytes())
        h.update(np.asarray(doc.ratings, np.int64).tobytes())
    for k in sorted(corp.vocab):
        h.update(f"{k}:{corp.vocab[k]};".encode())
    for k in sorted(corp.users):
        h.update(f"{k}:{corp.users[k]};".encode())
    return h.hexdigest()


def save(path: str, model) -> None:
    """Save an api.TopicModel's state + metadata.

    Per-document state fields are stored in **original document order**
    (de-permuted through the packing), so a checkpoint is portable
    across mesh shapes / chunk sizes whose bucketed row permutations
    differ.
    """
    fields = list(model.state._fields)
    doc_fields = set(getattr(model, "_per_doc_fields", ()))
    rows = model._doc_rows()
    arrays = {}
    for i, name in enumerate(fields):
        arr = np.asarray(getattr(model.state, name))
        if name in doc_fields:
            arr = arr[rows]              # packed rows → original doc order
        arrays[f"leaf_{i}"] = arr
    import dataclasses

    # replay the runtime knobs that shape packing/compute on load (paths
    # and profiling sinks are environment-specific and not replayed)
    runtime = {k: v for k, v in dataclasses.asdict(model.runtime).items()
               if k not in ("metrics_path", "profile_dir",
                            "checkpoint_dir") and v is not None}
    meta = dict(
        format=_FORMAT_VERSION,
        model=type(model).__name__,
        K=model.K,
        seed=model.seed,
        dtype=str(model.dtype),
        runtime=runtime,
        # cached at construction (api.TopicModel.__init__): the corpus is
        # immutable for the model's lifetime, and for packed-built models
        # it hashes the PRE-bucketing object the user holds, so load()
        # with the same input matches
        corpus=model._fingerprint,
        n_leaves=len(fields),
        fields=fields,
        doc_fields=sorted(doc_fields),
        ctor=getattr(model, "_ctor_kwargs", lambda: {})(),
        trained=model.topics is not None,
    )
    # write through a file handle so the exact path is used (np.savez
    # appends '.npz' to bare string paths, breaking the round trip)
    with open(path, "wb") as f:
        np.savez(f, __meta__=np.frombuffer(json.dumps(meta).encode(), np.uint8),
                 **arrays)


def load(path: str, corp: Corpus, strict_corpus: bool = True):
    """Rebuild the api model from a checkpoint + the original corpus.

    ``strict_corpus=True`` verifies the corpus fingerprint so a resumed
    run trains on exactly the data it left off with.
    """
    from . import api

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        leaves = [z[f"leaf_{i}"] for i in range(meta["n_leaves"])]

    if meta["format"] != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint format {meta['format']}")
    from .ops.packing import PackedCorpus

    fp = (packed_fingerprint(corp) if isinstance(corp, PackedCorpus)
          else corpus_fingerprint(corp))
    if strict_corpus and fp != meta["corpus"]:
        raise ValueError("checkpoint corpus fingerprint does not match the given corpus.")

    cls = getattr(api, meta["model"])
    from .utils.config import RuntimeConfig

    if "runtime" in meta:   # replay the saved runtime knobs
        rt = RuntimeConfig(**meta["runtime"])
    else:                   # older checkpoints: dtype + class preference
        rt = RuntimeConfig(dtype=meta["dtype"],
                           chunk_docs=getattr(cls, "_preferred_chunk", 1024))
    model = cls(corp, meta["K"], runtime=rt,
                seed=meta["seed"], **meta.get("ctor", {}))
    # per-doc fields were saved in original doc order; scatter them into
    # the load environment's (possibly different) packed row permutation,
    # leaving padding rows at their init values
    doc_fields = set(meta.get("doc_fields", []))
    rows = model._doc_rows()
    fixed = []
    for name, saved in zip(meta["fields"], leaves):
        saved = np.asarray(saved)
        ref = np.asarray(getattr(model.state, name))
        if name in doc_fields:
            if saved.shape[1:] != ref.shape[1:] or saved.shape[0] != len(rows):
                raise ValueError(
                    f"checkpoint field {name} shape {saved.shape} incompatible "
                    f"with {ref.shape} over {len(rows)} documents")
            out = ref.copy()
            out[rows] = saved
            saved = out
        elif saved.shape != ref.shape:
            raise ValueError(
                f"checkpoint field {name} shape {saved.shape} != {ref.shape}")
        fixed.append(saved.astype(ref.dtype))
    state_cls = type(model.state)
    model.state = state_cls(*fixed)
    # refresh derived artifacts (topics / scores / recs) — but only for a
    # trained checkpoint: an untrained model's recs must stay unranked
    if meta.get("trained", True):
        model._finalize()
    return model
