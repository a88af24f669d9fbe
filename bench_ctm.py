#!/usr/bin/env python
"""CTM benchmark: steady outer-iteration wall-clock at NSF scale, K=50.

Reference baseline: gpuCTM 10 iterations on NSF at K=50 in 276 s
(plots.R:4) => 27.6 s/iteration on an Apple-M1 OpenCL GPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
value is seconds per outer iteration (lower is better) and vs_baseline
is the speedup factor over 27.6 s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_packed_nsf_scale
    from topicmodelsvb_jl_tpu.models import ctm as ctm_mod
    from topicmodelsvb_jl_tpu.ops.packing import bucketize_packed
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh
    from topicmodelsvb_jl_tpu.parallel.shard import dp_jit

    K = int(os.environ.get("BENCH_K", 50))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    chunk = int(os.environ.get("BENCH_CHUNK", 1024))
    M = int(os.environ.get("BENCH_M", 128_804))

    packed = make_packed_nsf_scale(M=M, chunk_docs=chunk)
    mesh = make_mesh(axis_names=("data",))
    packed = bucketize_packed(packed, chunk=chunk, n_shards=mesh.shape["data"],
                              pad_multiple=32)

    state = ctm_mod.init(jax.random.PRNGKey(7), packed, K, jnp.float32)
    vtol = 1.0 / K**2
    step_local = ctm_mod.make_step(
        packed, K, viter=10, vtol=vtol, niter=1000, ntol=vtol,
        chunk_docs=chunk, axis_name="data",
    )
    spec = ctm_mod.partition_spec("data")
    step = dp_jit(step_local, mesh, spec, n_data_args=3, n_repl_args=1)

    data = (
        tuple(jnp.asarray(s.terms) for s in packed.segments),
        tuple(jnp.asarray(s.counts) for s in packed.segments),
        tuple(jnp.asarray(s.doc_mask) for s in packed.segments),
        jnp.asarray(float(packed.M), jnp.float32),
    )

    state = step(state, *data)          # compile + warm up
    float(jnp.sum(state.mu))

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state, *data)
        float(jnp.sum(state.mu))        # value fetch = real sync
        best = min(best, time.perf_counter() - t0)

    s_per_iter = best / iters
    baseline = 27.6  # reference gpuCTM NSF K=50 (plots.R:4)
    print(json.dumps({
        "metric": f"ctm_k{K}_nsf_s_per_iter",
        "value": round(s_per_iter, 3),
        "unit": "s/iter",
        "vs_baseline": round(baseline / s_per_iter, 3),
    }))


if __name__ == "__main__":
    main()
