#!/usr/bin/env python
"""Benchmark harness.

Headline metric: LDA K=100 E-step docs/sec at NSF scale (128,804 docs,
25,319 vocab — reference README.md:34-37), the BASELINE.json target.

Baseline for ``vs_baseline``: the reference's OpenCL gpuLDA wall-clock —
10 iterations on NSF at K=50 in 26 s (plots.R:4) ⇒ 49,540 docs/s.  We
run the *harder* K=100 configuration and compare against that figure.

The NSF docfile is stripped from this mirror (.MISSING_LARGE_BLOBS), so
documents are synthesized at the published scale with a Zipf-like vocab
distribution and realistic doc lengths, seed-controlled.  The benchmark
measures the full outer CAVI iteration (viter=10 E-step fixpoint +
sufficient stats + beta M-step + alpha Newton), not just a kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_packed_nsf_scale(M=128_804, V=25_319, mean_terms=85, seed=7,
                          chunk_docs=1024, pad_multiple=32, dtype=np.float32):
    """Vectorised synthetic corpus at NSF scale, packed directly."""
    from topicmodelsvb_jl_tpu.ops.packing import PackedCorpus

    rng = np.random.default_rng(seed)
    N = np.clip(rng.poisson(mean_terms, size=M), 8, None).astype(np.int32)
    L = int(-(-int(N.max()) // pad_multiple) * pad_multiple)
    M_pad = -(-M // chunk_docs) * chunk_docs

    # Zipf-ish vocab draw (u^3 skews mass to low ids), duplicates allowed
    u = rng.random((M_pad, L), dtype=np.float32)
    terms = np.minimum((V * u**3).astype(np.int32), V - 1)
    tok_idx = np.arange(L, dtype=np.int32)[None, :]
    N_full = np.zeros(M_pad, np.int32)
    N_full[:M] = N
    valid = tok_idx < N_full[:, None]
    counts = (1 + rng.poisson(0.35, size=(M_pad, L))).astype(dtype) * valid
    terms = terms * valid
    doc_mask = np.zeros(M_pad, dtype)
    doc_mask[:M] = 1.0
    return PackedCorpus(
        terms=terms, counts=counts, doc_mask=doc_mask, N=N_full,
        C=counts.sum(1).astype(dtype), M=M, V=V, L=L,
        max_count=int(counts.max()),
    )


def main():
    import jax
    import jax.numpy as jnp

    from topicmodelsvb_jl_tpu.models import lda as lda_mod
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh
    from topicmodelsvb_jl_tpu.parallel.shard import dp_jit

    K = int(os.environ.get("BENCH_K", 100))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    chunk = int(os.environ.get("BENCH_CHUNK", 1024))
    M = int(os.environ.get("BENCH_M", 128_804))

    from topicmodelsvb_jl_tpu.ops.packing import bucketize_packed

    packed = make_packed_nsf_scale(M=M, chunk_docs=chunk)
    mesh = make_mesh(axis_names=("data",))
    n_sh = mesh.shape["data"]
    packed = bucketize_packed(packed, chunk=chunk, n_shards=n_sh,
                              pad_multiple=32)

    state = lda_mod.init(jax.random.PRNGKey(7), packed, K, jnp.float32)
    vtol = 1.0 / K**2
    step_local = lda_mod.make_step(
        packed, K, viter=10, vtol=vtol, niter=1000, ntol=vtol,
        chunk_docs=chunk, axis_name="data",
    )
    spec = lda_mod.partition_spec("data")
    step = dp_jit(step_local, mesh, spec, n_data_args=3, n_repl_args=1)

    data = (
        tuple(jnp.asarray(s.terms) for s in packed.segments),
        tuple(jnp.asarray(s.counts) for s in packed.segments),
        tuple(jnp.asarray(s.doc_mask) for s in packed.segments),
        jnp.asarray(float(packed.M), jnp.float32),
    )

    # compile + warm up
    state = step(state, *data)
    jax.block_until_ready(state.beta)

    # best-of-2 chained runs: robust to a transient stall of the shared
    # device tunnel (observed ±40% between timeslices).  The end-of-run
    # sync is a scalar VALUE fetch — on the tunnelled device
    # block_until_ready can return before queued work completes, but a
    # fetch cannot.
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state, *data)
        float(jnp.sum(state.alpha))  # forces completion of the chain
        best = min(best, time.perf_counter() - t0)

    docs_per_s = packed.M * iters / best
    baseline = 128_804 * 10 / 26.0  # reference gpuLDA NSF K=50 (plots.R:4)
    print(json.dumps({
        "metric": f"lda_k{K}_nsf_estep_docs_per_sec",
        "value": round(docs_per_s, 1),
        "unit": "docs/s",
        "vs_baseline": round(docs_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
