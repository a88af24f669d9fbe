#!/usr/bin/env python
"""Benchmark harness.

Headline metric: LDA K=100 E-step docs/sec at NSF scale (128,804 docs,
25,319 vocab — reference README.md:34-37), the BASELINE.json target.

Baseline for ``vs_baseline``: the reference's OpenCL gpuLDA wall-clock —
10 iterations on NSF at K=50 in 26 s (plots.R:4) ⇒ 49,540 docs/s.  We
run the *harder* K=100 configuration and compare against that figure.

The NSF docfile is stripped from this mirror (.MISSING_LARGE_BLOBS), so
documents are synthesized at the published scale with a Zipf-like vocab
distribution and realistic doc lengths, seed-controlled
(datasets.synth_packed_nsf_scale).  The benchmark measures the full
outer CAVI iteration (viter=10 E-step fixpoint + sufficient stats +
beta M-step + alpha Newton) through the public api path — the same
step the CLI drives; the equivalent one-command run is:

    python -m topicmodelsvb_jl_tpu.train --model lda --corpus nsf-scale \\
        --k 100 --iter 10 --checkelbo inf --json

Noise handling: every timed chain restarts from the SAME warmed state
(identical work per chain — per-doc convergence masking means a chain
continuing from a converged state does less work), and the headline is
the median of 5 chains; each end-of-chain sync is a scalar VALUE fetch
(on the tunnelled device block_until_ready can return early, a value
fetch cannot).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# kept for bench_ctm.py / external scripts
from topicmodelsvb_jl_tpu.datasets import synth_packed_nsf_scale as \
    make_packed_nsf_scale  # noqa: E402


def timed_chains(step, data, warm_state, iters, reps, fetch):
    times = []
    for _ in range(reps):
        s = warm_state
        t0 = time.perf_counter()
        for _ in range(iters):
            s = step(s, *data)
        fetch(s)                      # value fetch = real sync
        times.append(time.perf_counter() - t0)
    return times


def main():
    import jax
    import jax.numpy as jnp

    from topicmodelsvb_jl_tpu.api import LDA
    from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig, TrainConfig

    K = int(os.environ.get("BENCH_K", 100))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    chunk = int(os.environ.get("BENCH_CHUNK", 1024))
    M = int(os.environ.get("BENCH_M", 128_804))
    reps = int(os.environ.get("BENCH_REPS", 5))

    packed = make_packed_nsf_scale(M=M, chunk_docs=chunk)
    rt = RuntimeConfig(chunk_docs=chunk, dtype="float32")
    model = LDA(packed, K, runtime=rt, seed=7)

    cfg = TrainConfig(iter=iters, checkelbo=float("inf")).resolved(K)
    model._cfg = cfg
    tr = model._build_trainer(cfg)
    state = jax.device_put(model.state, tr.state_sharding)

    # compile + warm up one step; all chains restart from this state
    warm = tr.step_fn(state, *tr.data)
    float(jnp.sum(warm.alpha))

    times = timed_chains(tr.step_fn, tr.data, warm, iters, reps,
                         lambda s: float(jnp.sum(s.alpha)))
    best = statistics.median(times)

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
