#!/usr/bin/env python
"""DTM benchmark: steady outer-iteration wall-clock at mac scale.

The v0.6 reference publishes no DTM timing, so the value is an absolute
s/iteration figure at the mac corpus scale (75,011 docs / 15,113 vocab /
12 time slices — the dataset readcorp(:mac) loads, v0.6 Corpus.jl:429),
K=20, viter=10, cgiter=10.  vs_baseline is null (nothing to compare).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from bench import make_packed_nsf_scale  # noqa: E402


def run_dtm(reps=None):
    import jax
    import jax.numpy as jnp

    from topicmodelsvb_jl_tpu.models import dtm as dtm_mod

    K = int(os.environ.get("BENCH_K", 20))
    T = int(os.environ.get("BENCH_T", 12))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    chunk = int(os.environ.get("BENCH_CHUNK", 512))
    M = int(os.environ.get("BENCH_M", 75_011))
    if reps is None:
        reps = int(os.environ.get("BENCH_REPS", 3))

    packed = make_packed_nsf_scale(M=M, V=15_113, mean_terms=220,
                                   chunk_docs=chunk)
    rng = np.random.default_rng(7)
    slice_id = np.zeros(packed.M_pad, np.int32)
    slice_id[: packed.M] = rng.integers(0, T, size=packed.M)

    vtol = 1.0 / K**2
    state = dtm_mod.init(jax.random.PRNGKey(7), packed, K, T, jnp.float32)
    step = jax.jit(dtm_mod.make_step(
        packed, K, T, viter=10, vtol=vtol, niter=1000, ntol=vtol,
        cgiter=10, cgtol=1.0 / T**2, chunk_docs=chunk))
    data = (jnp.asarray(slice_id), jnp.asarray(packed.terms),
            jnp.asarray(packed.counts), jnp.asarray(packed.doc_mask))

    warm = step(state, *data)
    float(jnp.sum(warm.alpha))

    times = []
    for _ in range(reps):
        s = warm
        t0 = time.perf_counter()
        for _ in range(iters):
            s = step(s, *data)
        float(jnp.sum(s.alpha))
        times.append(time.perf_counter() - t0)
    s_per_iter = statistics.median(times) / iters

    return {
        "metric": f"dtm_k{K}_t{T}_mac_s_per_iter",
        "value": round(s_per_iter, 3),
        "unit": "s/iter",
        "vs_baseline": None,
    }


if __name__ == "__main__":
    print(json.dumps(run_dtm()))
