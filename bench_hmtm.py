#!/usr/bin/env python
"""HMTM benchmark: steady outer-iteration wall-clock at NSF scale.

The reference never finished HMTM (HMTM/HMTM.jl's updatePhi! is empty),
so there is no upstream timing to compare — the value is an absolute
s/iteration figure for the structured-VB completion at NSF corpus scale
(128,804 docs / 25,319 vocab), K=25, viter=10: per outer iteration each
document runs (viter+1) scaled forward-backward passes over its token
chain — batched [B,K,K]x[B,K] contractions scanned over the token axis
— plus the beta segment-sum and the eta/alpha Dirichlet Newtons.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}
(vs_baseline null: nothing upstream to compare).
"""

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import make_packed_nsf_scale, timed_chains  # noqa: E402


def run_hmtm(reps=None):
    import jax
    import jax.numpy as jnp

    from topicmodelsvb_jl_tpu.api import HMTM
    from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig, TrainConfig

    K = int(os.environ.get("BENCH_K", 25))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    chunk = int(os.environ.get("BENCH_CHUNK", 1024))
    M = int(os.environ.get("BENCH_M", 128_804))
    if reps is None:
        reps = int(os.environ.get("BENCH_REPS", 3))

    from topicmodelsvb_jl_tpu.ops.packing import unit_counts
    # HMTM consumes an ordered token stream: counts must all be 1 (same
    # row count and forward-backward work either way — counts never enter)
    packed = unit_counts(make_packed_nsf_scale(M=M, chunk_docs=chunk))
    rt = RuntimeConfig(chunk_docs=chunk, dtype="float32")
    model = HMTM(packed, K, runtime=rt, seed=7)

    cfg = TrainConfig(iter=iters, checkelbo=float("inf")).resolved(K)
    model._cfg = cfg
    tr = model._build_trainer(cfg)
    state = jax.device_put(model.state, tr.state_sharding)

    warm = tr.step_fn(state, *tr.data)
    float(jnp.sum(warm.eta))

    times = timed_chains(tr.step_fn, tr.data, warm, iters, reps,
                         lambda s: float(jnp.sum(s.eta)))
    best = statistics.median(times) / iters
    return {
        "metric": f"hmtm_k{K}_nsf_s_per_iter",
        "value": round(best, 4),
        "unit": "s/iter",
        "vs_baseline": None,
    }


if __name__ == "__main__":
    print(json.dumps(run_hmtm()))
