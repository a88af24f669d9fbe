#!/usr/bin/env python
"""fLDA / fCTM benchmark at NSF scale (no reference GPU twins exist —
the reference's filtered models are CPU-only, so vs_baseline compares
against the unfiltered sibling's OpenCL baseline as a proxy ceiling:
gpuLDA 49.5k docs/s for fLDA, gpuCTM 27.6 s/iter for fCTM).

Same harness discipline as bench.py.  BENCH_MODEL=flda|fctm.
"""

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import make_packed_nsf_scale, timed_chains  # noqa: E402


def run_filtered(which=None, reps=None):
    import jax
    import jax.numpy as jnp

    from topicmodelsvb_jl_tpu.api import fCTM, fLDA
    from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig, TrainConfig

    if which is None:
        which = os.environ.get("BENCH_MODEL", "flda")
    K = int(os.environ.get("BENCH_K", 100 if which == "flda" else 50))
    iters = int(os.environ.get("BENCH_ITERS", 10 if which == "flda" else 3))
    chunk = int(os.environ.get("BENCH_CHUNK", 1024 if which == "flda" else 2048))
    M = int(os.environ.get("BENCH_M", 128_804))
    if reps is None:
        reps = int(os.environ.get("BENCH_REPS", 3))

    packed = make_packed_nsf_scale(M=M, chunk_docs=chunk)
    rt = RuntimeConfig(chunk_docs=chunk, dtype="float32")
    cls = fLDA if which == "flda" else fCTM
    model = cls(packed, K, runtime=rt, seed=7)

    cfg = TrainConfig(iter=iters, checkelbo=float("inf")).resolved(K)
    model._cfg = cfg
    tr = model._build_trainer(cfg)
    state = jax.device_put(model.state, tr.state_sharding)

    warm = tr.step_fn(state, *tr.data)
    float(jnp.sum(warm.beta))

    times = timed_chains(tr.step_fn, tr.data, warm, iters, reps,
                         lambda s: float(jnp.sum(s.beta)))
    best = statistics.median(times)

    if which == "flda":
        docs_per_s = packed.M * iters / best
        baseline = 128_804 * 10 / 26.0   # gpuLDA proxy (plots.R:4)
        out = {"metric": f"flda_k{K}_nsf_docs_per_sec",
               "value": round(docs_per_s, 1), "unit": "docs/s",
               "vs_baseline": round(docs_per_s / baseline, 3)}
    else:
        s_per_iter = best / iters
        baseline = 27.6                  # gpuCTM proxy (plots.R:4)
        out = {"metric": f"fctm_k{K}_nsf_s_per_iter",
               "value": round(s_per_iter, 3), "unit": "s/iter",
               "vs_baseline": round(baseline / s_per_iter, 3)}
    return out


if __name__ == "__main__":
    print(json.dumps(run_filtered()))
