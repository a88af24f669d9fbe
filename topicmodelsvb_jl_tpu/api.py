"""User-facing model API.

Mirrors the reference's public surface (src/TopicModelsVB.jl:11-18):
``Model(corp, K)`` constructors, ``train(...)`` with the reference's
kwargs and defaults, and the post-hoc tools ``topicdist``,
``showtopics``, plus (per model) ``predict``, ``gendoc``/``gencorp``,
``showlibs``/``showdrecs``/``showurecs``.

Unlike the reference there is no CPU/GPU model split and no ``@gpu``
macro (macros.jl:106-284): every model runs the same jitted,
shard_map'd TPU path whether the mesh has 1 device or a pod slice.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import corpus as corpuslib
from .corpus import Corpus, CorpusError
from .engine import Trainer
from .models import ctm as ctm_mod
from .models import fctm as fctm_mod
from .models import flda as flda_mod
from .models import lda as lda_mod
from .ops.packing import pack_corpus
from .parallel.mesh import make_mesh
from .parallel.shard import dp_jit
from .utils.config import RuntimeConfig, TrainConfig


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m if x > 0 else m


class TopicModelError(Exception):
    """Mirror of the reference TopicModelError (modelutils.jl:1-5)."""


class TopicModel:
    """Common construction/packing/mesh logic for all five models."""

    _uses_readers = False

    def __init__(
        self,
        corp: Corpus,
        K: int,
        runtime: Optional[RuntimeConfig] = None,
        mesh=None,
        seed: int = 0,
    ):
        corpuslib.check_corp(corp)
        if K <= 0:
            raise ValueError("number of topics must be a positive integer.")

        self.K = int(K)
        self.corp = corp.copy()  # corpus-level isolation (LDA.jl:44)
        self.M, self.V, self.U = corp.shape
        self.N = [len(doc) for doc in corp.docs]
        self.C = [doc.size for doc in corp.docs]
        self.runtime = runtime or RuntimeConfig()
        self.mesh = mesh if mesh is not None else make_mesh(axis_names=(self.runtime.data_axis,))
        self.seed = seed

        n_sh = self.mesh.shape[self.runtime.data_axis]
        per_shard = max(1, math.ceil(max(self.M, 1) / n_sh))
        self.chunk_docs = min(self.runtime.chunk_docs, _round_up(per_shard, 8))
        self.packed = pack_corpus(
            self.corp,
            pad_multiple=self.runtime.pad_multiple,
            docs_multiple=self.chunk_docs * n_sh,
            with_readers=self._uses_readers,
            dtype=np.dtype(self.runtime.dtype),
        )
        self.dtype = jnp.dtype(self.runtime.dtype)
        self.key = jax.random.PRNGKey(seed)
        self.state = None
        self.trainer: Optional[Trainer] = None
        self.topics: Optional[np.ndarray] = None  # [K, V] 1-based rankings
        self._init_state()

    # ── subclass hooks ──
    def _init_state(self):
        raise NotImplementedError

    def _build_trainer(self, cfg: TrainConfig) -> Trainer:
        raise NotImplementedError

    def _finalize(self):
        """Post-train artifacts (topics ranking etc.)."""
        self.topics = lda_mod.topics_ranking(self._topic_word_matrix())

    def _topic_word_matrix(self) -> np.ndarray:
        return np.asarray(self.state.beta)

    # ── training (reference train!, LDA.jl:161-191) ──
    def train(
        self,
        iter: int = 150,
        tol: float = 1.0,
        niter: int = 1000,
        ntol: Optional[float] = None,
        viter: int = 10,
        vtol: Optional[float] = None,
        checkelbo: float = 1,
        printelbo: bool = True,
    ):
        cfg = TrainConfig(
            iter=iter, tol=tol, niter=niter, ntol=ntol, viter=viter,
            vtol=vtol, checkelbo=checkelbo, printelbo=printelbo,
        ).resolved(self.K)
        cfg.validate()
        self.trainer = self._build_trainer(cfg)
        all_empty = all(n == 0 for n in self.N)
        self.state = self.trainer.train(self.state, cfg, corpus_all_empty=all_empty)
        self._finalize()
        return self

    # ── post-hoc API ──
    @property
    def elbo(self) -> float:
        return float(self.state.elbo)

    def topicdist(self, d):
        """Topic distribution for doc(s), 1-based index (modelutils.jl:946-984)."""
        scalar = np.isscalar(d)
        idx = np.atleast_1d(np.asarray(d, dtype=np.int64))
        if np.any((idx < 1) | (idx > self.M)):
            raise CorpusError("some document indices outside corpus range.")
        out = self._topicdist_rows(idx - 1)
        return out[0] if scalar else out

    def _topicdist_rows(self, rows: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def showtopics(self, V: int = 15, topics=None, cols: int = 4):
        """Aligned top-terms display (reference modelutils.jl:656-684)."""
        if V <= 0:
            raise ValueError("number of displayed terms must be a positive integer.")
        if cols <= 0:
            raise ValueError("cols must be a positive integer.")
        if topics is None:
            topics = range(1, self.K + 1)
        if isinstance(topics, int):
            topics = [topics]
        topics = list(topics)
        if not all(1 <= t <= self.K for t in topics):
            raise ValueError("some topic indices are outside range.")
        V = min(V, self.V)
        cols = min(cols, len(topics))
        vocab = self.corp.vocab
        rank = self.topics if self.topics is not None else lda_mod.topics_ranking(
            self._topic_word_matrix()
        )

        blocks = [topics[i : i + cols] for i in range(0, len(topics), cols)]
        for n, block in enumerate(blocks):
            col_words = [[vocab[int(rank[t - 1, j])] for j in range(V)] for t in block]
            widths = [
                max(len(f"topic {t}"), max(len(w) for w in words)) + 3
                for t, words in zip(block, col_words)
            ]
            line = "".join(f"topic {t}".ljust(w) for t, w in zip(block, widths))
            print(line.rstrip())
            for j in range(V):
                print("".join(words[j].ljust(w) for words, w in zip(col_words, widths)).rstrip())
            if n < len(blocks) - 1:
                print()

    def showdocs(self, docs=None):
        corpuslib.showdocs(self.corp, docs)

    def showtitles(self, docs=None):
        corpuslib.showtitles(self.corp, docs)

    def getvocab(self):
        return corpuslib.getvocab(self.corp)

    def getusers(self):
        return corpuslib.getusers(self.corp)


class LDA(TopicModel):
    """Latent Dirichlet allocation (reference src/LDA.jl, src/gpuLDA.jl)."""

    def __repr__(self):
        return f"Latent Dirichlet allocation model with {self.K} topics."

    def _init_state(self):
        self.state = lda_mod.init(self.key, self.packed, self.K, self.dtype)

    def _build_trainer(self, cfg: TrainConfig) -> Trainer:
        p = self.packed
        step_local = lda_mod.make_step(
            p, self.K, viter=cfg.viter, vtol=cfg.vtol, niter=cfg.niter,
            ntol=cfg.ntol, chunk_docs=self.chunk_docs,
            axis_name=self.runtime.data_axis,
        )
        elbo_local = lda_mod.make_elbo(
            p, self.K, chunk_docs=self.chunk_docs, axis_name=self.runtime.data_axis
        )
        spec = lda_mod.partition_spec(self.runtime.data_axis)
        from jax.sharding import PartitionSpec as P

        step = dp_jit(step_local, self.mesh, spec, n_data_args=3, n_repl_args=1,
                      data_axis=self.runtime.data_axis)
        elbo = dp_jit(elbo_local, self.mesh, spec, n_data_args=3, out_spec=P(),
                      data_axis=self.runtime.data_axis)

        arrs = (jnp.asarray(p.terms), jnp.asarray(p.counts), jnp.asarray(p.doc_mask))
        data = arrs + (jnp.asarray(float(self.M), self.dtype),)
        return Trainer(step, elbo, data, arrs, M=self.M)

    # alpha/beta/gamma accessors (reference field access)
    @property
    def alpha(self) -> np.ndarray:
        return np.asarray(self.state.alpha)

    @property
    def beta(self) -> np.ndarray:
        return np.asarray(self.state.beta)

    @property
    def gamma(self) -> np.ndarray:
        return np.asarray(self.state.gamma)[: self.M]

    @property
    def Elogtheta(self) -> np.ndarray:
        return np.asarray(self.state.Elogtheta)[: self.M]

    def _topicdist_rows(self, rows: np.ndarray) -> np.ndarray:
        g = np.asarray(self.state.gamma)[rows]
        return g / g.sum(axis=-1, keepdims=True)


class CTM(TopicModel):
    """Correlated topic model (reference src/CTM.jl, src/gpuCTM.jl)."""

    def __repr__(self):
        return f"Correlated topic model with {self.K} topics."

    def _init_state(self):
        self.state = ctm_mod.init(self.key, self.packed, self.K, self.dtype)

    def _build_trainer(self, cfg: TrainConfig) -> Trainer:
        p = self.packed
        step_local = ctm_mod.make_step(
            p, self.K, viter=cfg.viter, vtol=cfg.vtol, niter=cfg.niter,
            ntol=cfg.ntol, chunk_docs=self.chunk_docs,
            axis_name=self.runtime.data_axis,
        )
        elbo_local = ctm_mod.make_elbo(
            p, self.K, chunk_docs=self.chunk_docs, axis_name=self.runtime.data_axis
        )
        spec = ctm_mod.partition_spec(self.runtime.data_axis)
        from jax.sharding import PartitionSpec as P

        step = dp_jit(step_local, self.mesh, spec, n_data_args=4, n_repl_args=1,
                      data_axis=self.runtime.data_axis)
        elbo = dp_jit(elbo_local, self.mesh, spec, n_data_args=4, out_spec=P(),
                      data_axis=self.runtime.data_axis)
        arrs = (jnp.asarray(p.terms), jnp.asarray(p.counts),
                jnp.asarray(p.C), jnp.asarray(p.doc_mask))
        data = arrs + (jnp.asarray(float(self.M), self.dtype),)
        return Trainer(step, elbo, data, arrs, M=self.M)

    @property
    def mu(self) -> np.ndarray:
        return np.asarray(self.state.mu)

    @property
    def sigma(self) -> np.ndarray:
        return np.asarray(self.state.sigma)

    @property
    def invsigma(self) -> np.ndarray:
        return np.asarray(self.state.invsigma)

    @property
    def beta(self) -> np.ndarray:
        return np.asarray(self.state.beta)

    @property
    def lam(self) -> np.ndarray:
        return np.asarray(self.state.lam)[: self.M]

    # Julia field name
    lambda_ = lam

    @property
    def vsq(self) -> np.ndarray:
        return np.asarray(self.state.vsq)[: self.M]

    @property
    def logzeta(self) -> np.ndarray:
        return np.asarray(self.state.logzeta)[: self.M]

    def _topicdist_rows(self, rows: np.ndarray) -> np.ndarray:
        x = np.asarray(self.state.lam)[rows] + 0.5 * np.asarray(self.state.vsq)[rows]
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)


class fCTM(TopicModel):
    """Filtered correlated topic model (reference src/fCTM.jl)."""

    def __repr__(self):
        return f"Filtered correlated topic model with {self.K} topics."

    def _init_state(self):
        self.state = fctm_mod.init(self.key, self.packed, self.K, self.dtype)

    def _build_trainer(self, cfg: TrainConfig) -> Trainer:
        p = self.packed
        step_local = fctm_mod.make_step(
            p, self.K, viter=cfg.viter, vtol=cfg.vtol, niter=cfg.niter,
            ntol=cfg.ntol, chunk_docs=self.chunk_docs,
            axis_name=self.runtime.data_axis,
        )
        elbo_local = fctm_mod.make_elbo(
            p, self.K, chunk_docs=self.chunk_docs, axis_name=self.runtime.data_axis
        )
        spec = fctm_mod.partition_spec(self.runtime.data_axis)
        from jax.sharding import PartitionSpec as P

        step = dp_jit(step_local, self.mesh, spec, n_data_args=4, n_repl_args=1,
                      data_axis=self.runtime.data_axis)
        elbo = dp_jit(elbo_local, self.mesh, spec, n_data_args=4, out_spec=P(),
                      data_axis=self.runtime.data_axis)
        arrs = (jnp.asarray(p.terms), jnp.asarray(p.counts),
                jnp.asarray(p.C), jnp.asarray(p.doc_mask))
        data = arrs + (jnp.asarray(float(self.M), self.dtype),)
        return Trainer(step, elbo, data, arrs, M=self.M)

    @property
    def eta(self) -> float:
        return float(self.state.eta)

    @property
    def mu(self) -> np.ndarray:
        return np.asarray(self.state.mu)

    @property
    def sigma(self) -> np.ndarray:
        return np.asarray(self.state.sigma)

    @property
    def invsigma(self) -> np.ndarray:
        return np.asarray(self.state.invsigma)

    @property
    def kappa(self) -> np.ndarray:
        return np.asarray(self.state.kappa)

    @property
    def beta(self) -> np.ndarray:
        return np.asarray(self.state.beta)

    @property
    def lam(self) -> np.ndarray:
        return np.asarray(self.state.lam)[: self.M]

    @property
    def vsq(self) -> np.ndarray:
        return np.asarray(self.state.vsq)[: self.M]

    @property
    def logzeta(self) -> np.ndarray:
        return np.asarray(self.state.logzeta)[: self.M]

    @property
    def tau(self):
        t = np.asarray(self.state.tau)
        return [t[d, : self.N[d]] for d in range(self.M)]

    def _topicdist_rows(self, rows: np.ndarray) -> np.ndarray:
        x = np.asarray(self.state.lam)[rows] + 0.5 * np.asarray(self.state.vsq)[rows]
        e = np.exp(x - x.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)


class fLDA(TopicModel):
    """Filtered LDA (reference src/fLDA.jl)."""

    def __repr__(self):
        return f"Filtered latent Dirichlet allocation model with {self.K} topics."

    def _init_state(self):
        self.state = flda_mod.init(self.key, self.packed, self.K, self.dtype)

    def _build_trainer(self, cfg: TrainConfig) -> Trainer:
        p = self.packed
        step_local = flda_mod.make_step(
            p, self.K, viter=cfg.viter, vtol=cfg.vtol, niter=cfg.niter,
            ntol=cfg.ntol, chunk_docs=self.chunk_docs,
            axis_name=self.runtime.data_axis,
        )
        elbo_local = flda_mod.make_elbo(
            p, self.K, chunk_docs=self.chunk_docs, axis_name=self.runtime.data_axis
        )
        spec = flda_mod.partition_spec(self.runtime.data_axis)
        from jax.sharding import PartitionSpec as P

        step = dp_jit(step_local, self.mesh, spec, n_data_args=3, n_repl_args=2,
                      data_axis=self.runtime.data_axis)
        elbo = dp_jit(elbo_local, self.mesh, spec, n_data_args=3, out_spec=P(),
                      data_axis=self.runtime.data_axis)
        arrs = (jnp.asarray(p.terms), jnp.asarray(p.counts), jnp.asarray(p.doc_mask))
        data = arrs + (
            jnp.asarray(float(self.M), self.dtype),
            jnp.asarray(float(sum(self.C)), self.dtype),
        )
        return Trainer(step, elbo, data, arrs, M=self.M)

    @property
    def eta(self) -> float:
        return float(self.state.eta)

    @property
    def alpha(self) -> np.ndarray:
        return np.asarray(self.state.alpha)

    @property
    def kappa(self) -> np.ndarray:
        return np.asarray(self.state.kappa)

    @property
    def beta(self) -> np.ndarray:
        return np.asarray(self.state.beta)

    @property
    def gamma(self) -> np.ndarray:
        return np.asarray(self.state.gamma)[: self.M]

    @property
    def tau(self):
        """Ragged view: list of per-doc tau vectors (reference fLDA.jl:25)."""
        t = np.asarray(self.state.tau)
        return [t[d, : self.N[d]] for d in range(self.M)]

    def _topicdist_rows(self, rows: np.ndarray) -> np.ndarray:
        g = np.asarray(self.state.gamma)[rows]
        return g / g.sum(axis=-1, keepdims=True)
