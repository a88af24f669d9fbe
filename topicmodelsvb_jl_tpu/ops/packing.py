"""Ragged→dense corpus packing for TPU.

The reference GPU path flattens the ragged corpus into CSR-style
concatenated streams plus a precomputed inverted index
(``terms_sortperm``/``J_cumsum``) so its OpenCL beta/alef kernels can
scatter-add race-free (modelutils.jl:370-494).  Under XLA none of that
is needed: documents are packed into dense ``[M_pad, L]`` blocks
(zero-count padding), the per-token scatter becomes a deterministic
``jax.ops.segment_sum`` over vocab ids, and raggedness is handled by
masking — padded slots carry ``count = 0`` so they contribute exactly
nothing to any statistic or ELBO term.

``M_pad`` is rounded up so the doc axis divides evenly into
``chunk_docs``-sized chunks across every data shard; padded documents
have ``doc_mask = 0``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..corpus import Corpus


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if x > 0 else m


@dataclasses.dataclass(frozen=True)
class PackedCorpus:
    """Dense, device-ready corpus arrays (host NumPy; moved by jit).

    ``terms``/``readers`` are **0-based** (reference keys are 1-based);
    padded slots point at id 0 with zero count/rating, so scatters into
    segment 0 add zeros.
    """

    terms: np.ndarray        # [M_pad, L] int32, 0-based vocab ids
    counts: np.ndarray       # [M_pad, L] float, 0 on padding
    doc_mask: np.ndarray     # [M_pad] float, 1 for real docs
    N: np.ndarray            # [M_pad] int32  unique-term counts
    C: np.ndarray            # [M_pad] float  Σcounts per doc
    M: int                   # number of real documents
    V: int
    L: int
    readers: Optional[np.ndarray] = None   # [M_pad, R] int32, 0-based user ids
    ratings: Optional[np.ndarray] = None   # [M_pad, R] float, 0 on padding
    R: Optional[np.ndarray] = None         # [M_pad] int32 reader counts
    U: int = 0
    Rmax: int = 0
    max_count: int = 0       # max single term count (bounds CTPF's E[log y!] loop)
    max_rating: int = 0

    @property
    def M_pad(self) -> int:
        return self.terms.shape[0]

    def chunked(self, n_chunks: int):
        """Reshape doc axis to [n_chunks, B, ...] views for lax.scan."""
        assert self.M_pad % n_chunks == 0, (self.M_pad, n_chunks)

        def r(a):
            return None if a is None else a.reshape((n_chunks, -1) + a.shape[1:])

        return {
            "terms": r(self.terms), "counts": r(self.counts),
            "doc_mask": r(self.doc_mask), "C": r(self.C),
            **({"readers": r(self.readers), "ratings": r(self.ratings)}
               if self.readers is not None else {}),
        }


def pack_corpus(
    corp: Corpus,
    pad_multiple: int = 64,
    docs_multiple: int = 8,
    with_readers: bool = False,
    dtype=np.float32,
) -> PackedCorpus:
    """Pack a checked corpus into dense padded arrays.

    ``pad_multiple`` rounds the token axis L (lane friendliness on TPU);
    ``docs_multiple`` rounds the doc axis (must absorb chunk × shard
    divisibility — callers pass ``chunk_docs * n_data_shards``).
    """
    M, V, U = corp.shape
    N = np.array([len(doc) for doc in corp.docs], dtype=np.int32)
    L = _round_up(int(N.max()) if M else 1, pad_multiple)
    M_pad = _round_up(max(M, 1), docs_multiple)

    terms = np.zeros((M_pad, L), dtype=np.int32)
    counts = np.zeros((M_pad, L), dtype=dtype)
    for d, doc in enumerate(corp.docs):
        n = len(doc.terms)
        if n:
            terms[d, :n] = np.asarray(doc.terms, dtype=np.int64) - 1
            counts[d, :n] = doc.counts

    doc_mask = np.zeros(M_pad, dtype=dtype)
    doc_mask[:M] = 1.0
    N_full = np.zeros(M_pad, dtype=np.int32)
    N_full[:M] = N
    C = counts.sum(axis=1).astype(dtype)
    max_count = int(counts.max()) if M else 0

    kw = {}
    Rmax = 0
    max_rating = 0
    if with_readers:
        Rv = np.array([len(doc.readers) for doc in corp.docs], dtype=np.int32)
        Rmax = _round_up(int(Rv.max()) if M and Rv.size and Rv.max() > 0 else 1, 8)
        readers = np.zeros((M_pad, Rmax), dtype=np.int32)
        ratings = np.zeros((M_pad, Rmax), dtype=dtype)
        for d, doc in enumerate(corp.docs):
            r = len(doc.readers)
            if r:
                readers[d, :r] = np.asarray(doc.readers, dtype=np.int64) - 1
                ratings[d, :r] = doc.ratings
        R_full = np.zeros(M_pad, dtype=np.int32)
        R_full[:M] = Rv
        max_rating = int(ratings.max()) if M else 0
        kw = dict(readers=readers, ratings=ratings, R=R_full, U=U, Rmax=Rmax)

    return PackedCorpus(
        terms=terms, counts=counts, doc_mask=doc_mask, N=N_full, C=C,
        M=M, V=V, L=L, max_count=max_count, max_rating=max_rating, **kw
    )
