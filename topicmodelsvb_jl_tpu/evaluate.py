"""Model evaluation metrics — beyond the reference's capability surface.

The reference evaluates models only by eyeballing topics and the CTPF
held-out-rank demo (README.md:512-580).  This module adds the two
standard quantitative metrics of the topic-modeling literature:

* :func:`perplexity` — held-out per-word predictive perplexity
  ``exp(−Σ log p(w|d) / Σ counts)``, with the document-topic posterior
  inferred by the same E-step-only path as :func:`~.api.predict`.
  This is the common "direct" estimate (theta inferred on the scored
  tokens — optimistic relative to document-completion schemes, but the
  standard like-for-like comparison number).
* :func:`topic_coherence` — UMass coherence (Mimno et al. 2011):
  ``C_k = Σ_{i<j≤N} log[(D(w_i, w_j) + 1) / D(w_j)]`` over each topic's
  top-N words, with document (co-)occurrence counts from a reference
  corpus.  Higher (closer to 0) is better.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .corpus import Corpus


def perplexity(corp: Corpus, train_model, iter: int = 10,
               tol: Optional[float] = None) -> float:
    """Held-out per-word perplexity of ``corp`` under ``train_model``.

    Supported for LDA/fLDA/CTM/fCTM (the models with a document-topic
    simplex and a topic-word matrix).  fLDA/fCTM use the full mixture
    ``eta·(θβ)_w + (1−eta)·κ_w`` (fLDA.jl's generative story).
    """
    from .api import CTM, LDA, fCTM, fLDA, predict

    if not isinstance(train_model, (LDA, fLDA, CTM, fCTM)):
        raise TypeError(
            f"perplexity is not defined for {type(train_model).__name__}")
    pred = predict(corp, train_model, iter=iter, tol=tol)

    beta = np.asarray(train_model.beta, np.float64)        # [K, V]
    rows = pred._doc_rows()
    theta = np.asarray(pred._topicdist_rows(rows), np.float64)  # [M, K]
    # per-document mixture only at the observed terms — never the dense
    # [M, V] matrix (tens of GB at the corpus scales this targets)
    filtered = isinstance(train_model, (fLDA, fCTM))
    if filtered:
        eta = float(train_model.eta)
        kappa = np.asarray(train_model.state.kappa, np.float64)

    ll = 0.0
    n_tokens = 0.0
    for d, doc in enumerate(corp.docs):
        if not doc.terms:
            continue
        t = np.asarray(doc.terms, np.int64) - 1
        c = np.asarray(doc.counts, np.float64)
        p = theta[d] @ beta[:, t]
        if filtered:
            p = eta * p + (1.0 - eta) * kappa[t]
        p = np.maximum(p, 1e-300)
        ll += float(np.dot(c, np.log(p)))
        n_tokens += float(c.sum())
    if n_tokens == 0:
        raise ValueError("perplexity needs at least one token.")
    return float(np.exp(-ll / n_tokens))


def topic_coherence(model, N: int = 10,
                    corp: Optional[Corpus] = None) -> np.ndarray:
    """UMass coherence per topic over the top-``N`` words.

    ``corp`` defaults to the model's training corpus; pass one
    explicitly for models built from a PackedCorpus.
    """
    corp = corp if corp is not None else model.corp
    if corp is None:
        raise ValueError(
            "topic_coherence needs a Corpus (the model was built from "
            "a PackedCorpus; pass corp=...).")
    if N < 2:
        raise ValueError("N must be at least 2.")
    if model.topics is None:
        raise ValueError("train the model first (topics ranking unset).")

    K = model.K
    top = np.asarray(model.topics)[:, :N]                  # 1-based ids
    need = sorted({int(w) for row in top for w in row})
    col = {w: j for j, w in enumerate(need)}
    # doc-incidence matrix for just the needed words
    M = len(corp.docs)
    inc = np.zeros((M, len(need)), dtype=np.bool_)
    for d, doc in enumerate(corp.docs):
        for w in doc.terms:
            j = col.get(int(w))
            if j is not None:
                inc[d, j] = True
    D = inc.sum(axis=0).astype(np.float64)                 # D(w)
    CO = (inc.T.astype(np.float64) @ inc)                  # D(w_i, w_j)

    scores = np.zeros(K)
    for k in range(K):
        ids = [col[int(w)] for w in top[k]]
        s = 0.0
        for i in range(1, len(ids)):
            for j in range(i):
                denom = max(D[ids[j]], 1.0)
                s += np.log((CO[ids[i], ids[j]] + 1.0) / denom)
        scores[k] = s
    return scores
