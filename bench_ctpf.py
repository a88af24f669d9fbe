#!/usr/bin/env python
"""CTPF benchmark: steady outer-iteration wall-clock at CiteULike scale.

Reference baseline: gpuCTPF 10 iterations on CiteULike at K=100 in 22 s
(plots.R:4,17) => 2.2 s/iteration on an Apple-M1 OpenCL GPU.

Corpus: 16,980 docs / 8,000 vocab / 5,551 users (reference
README.md:38-41); the docfile is stripped from this mirror, so documents
+ reader lists are synthesized at published scale (datasets.load_citeu
falls back to the generative sampler).  Same harness discipline as
bench.py: public api path, timed chains restarting from one warmed
state, median of BENCH_REPS chains, value-fetch syncs.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
value is seconds per outer iteration and vs_baseline the speedup factor
over 2.2 s.
"""

import json
import os
import statistics
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import timed_chains  # noqa: E402


def run_ctpf(reps=None):
    import jax
    import jax.numpy as jnp

    from topicmodelsvb_jl_tpu.api import CTPF
    from topicmodelsvb_jl_tpu.datasets import load_citeu
    from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig, TrainConfig

    K = int(os.environ.get("BENCH_K", 100))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    chunk = int(os.environ.get("BENCH_CHUNK", 1024))
    if reps is None:
        reps = int(os.environ.get("BENCH_REPS", 3))

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        corp = load_citeu()
    rt = RuntimeConfig(chunk_docs=chunk, dtype="float32")
    model = CTPF(corp, K, runtime=rt, seed=7)

    cfg = TrainConfig(iter=iters, checkelbo=float("inf")).resolved(K)
    model._cfg = cfg
    tr = model._build_trainer(cfg)
    state = jax.device_put(model.state, tr.state_sharding)

    warm = tr.step_fn(state, *tr.data)
    float(jnp.sum(warm.bet))

    times = timed_chains(tr.step_fn, tr.data, warm, iters, reps,
                         lambda s: float(jnp.sum(s.bet)))
    best = statistics.median(times)

    s_per_iter = best / iters
    baseline = 2.2  # reference gpuCTPF CiteULike K=100 (plots.R:4,17)
    return {
        "metric": f"ctpf_k{K}_citeu_s_per_iter",
        "value": round(s_per_iter, 4),
        "unit": "s/iter",
        "vs_baseline": round(baseline / s_per_iter, 3),
    }


if __name__ == "__main__":
    print(json.dumps(run_ctpf()))
