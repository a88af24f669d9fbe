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

Modes beyond the default headline run:

  python bench.py --assert       regression gate: FIRST an on-chip
                                 Pallas-vs-XLA value-equivalence check
                                 (run_kernel_check — a Mosaic lowering
                                 regression fails the gate as a
                                 correctness error, not a perf
                                 mystery), then the six standard
                                 configs (LDA K=100 / CTM K=50 / fLDA
                                 K=100 / fCTM K=50 / DTM K=20 at their
                                 corpus scales, CTPF K=100 CiteULike),
                                 median of 5 chains each, and FAIL
                                 (exit 1) below the agreed floors —
                                 LDA >= 600k docs/s, CTM <= 0.7 s/iter,
                                 CTPF <= 40 ms/iter, fLDA >= 290k
                                 docs/s, fCTM <= 1.3 s/iter,
                                 DTM <= 0.8 s/iter, HMTM <= 0.65 s/iter.
  python bench.py --sweep-dist   sensitivity of the LDA headline to the
                                 synthetic vocab draw: one JSON line per
                                 skew exponent (1.5 flatter / 3 Zipf-u^3
                                 headline / 5 spikier) — bounds the
                                 synthetic-corpus uncertainty
                                 (RESULTS.md "distribution sensitivity").
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


def run_lda(reps=None, skew=3.0):
    """LDA headline measurement; returns the result dict."""
    import jax
    import jax.numpy as jnp

    from topicmodelsvb_jl_tpu.api import LDA
    from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig, TrainConfig

    K = int(os.environ.get("BENCH_K", 100))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    chunk = int(os.environ.get("BENCH_CHUNK", 1024))
    M = int(os.environ.get("BENCH_M", 128_804))
    if reps is None:
        reps = int(os.environ.get("BENCH_REPS", 5))

    packed = make_packed_nsf_scale(M=M, chunk_docs=chunk, skew=skew)
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
    tag = "" if skew == 3.0 else f"_skew{skew:g}"
    return {
        "metric": f"lda_k{K}_nsf_estep_docs_per_sec{tag}",
        "value": round(docs_per_s, 1),
        "unit": "docs/s",
        "vs_baseline": round(docs_per_s / baseline, 3),
    }


# regression floors (VERDICT r2 #8): each entry is the bench runner, the
# floor, and whether higher is better for its value field
def run_kernel_check():
    """ON-CHIP Pallas-vs-XLA value equivalence (VERDICT r3 #9).

    CI validates the kernels only in interpret mode on CPU
    (tests/test_kernels.py) — a Mosaic lowering regression would
    otherwise surface here as a perf mystery, not a correctness
    failure.  One small NSF-shaped config per compiled kernel family:
    the LDA fused E-step, the LDA/CTM fused ELBO (CTM reuses the LDA
    kernel), each compared against its pure-XLA twin on the real
    device.  value = the worst deviation as a FRACTION of its CI
    tolerance (E-step beta: rtol 5e-3/atol 1e-5 as in
    tests/test_kernels.py, two f32 fixpoint iterations diverge; ELBO:
    1e-5 relative); floor 1.0 = at tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from topicmodelsvb_jl_tpu.models import ctm as ctm_mod
    from topicmodelsvb_jl_tpu.models import lda as lda_mod
    from topicmodelsvb_jl_tpu.utils.numerics import elbo_value

    packed = make_packed_nsf_scale(M=4096, chunk_docs=512)
    data3 = (jnp.asarray(packed.terms), jnp.asarray(packed.counts),
             jnp.asarray(packed.doc_mask))
    M_f = jnp.asarray(float(packed.M), jnp.float32)
    worst = 0.0
    for mod, K in ((lda_mod, 100), (ctm_mod, 50)):
        kw = dict(viter=4, vtol=1.0 / K**2, niter=30, ntol=1.0 / K**2,
                  chunk_docs=512, axis_name=None)
        sx = jax.jit(mod.make_step(packed, K, use_pallas=False, **kw))
        sp = jax.jit(mod.make_step(packed, K, use_pallas=True, **kw))
        st0 = mod.init(jax.random.PRNGKey(0), packed, K, jnp.float32)
        stx = sp_state = st0
        for _ in range(2):
            stx, sp_state = sx(stx, *data3, M_f), sp(sp_state, *data3, M_f)
        # E-step equivalence: the sufficient-statistic carrier (beta)
        bx, bp = np.asarray(stx.beta), np.asarray(sp_state.beta)
        estep_dev = float(np.max(np.abs(bx - bp)
                                 / (1e-5 + 5e-3 * np.abs(bx))))
        worst = max(worst, estep_dev)
        # ELBO equivalence on the XLA-stepped state
        ex = jax.jit(mod.make_elbo(packed, K, chunk_docs=512,
                                   use_pallas=False))
        ep = jax.jit(mod.make_elbo(packed, K, chunk_docs=512,
                                   use_pallas=True))
        a, b = elbo_value(ex(stx, *data3)), elbo_value(ep(stx, *data3))
        worst = max(worst, (abs(a - b) / abs(a)) / 1e-5)
    return {"metric": "kernel_vs_xla_dev_over_tol", "value": worst,
            "unit": "fraction of CI tolerance", "vs_baseline": 0.0}


def _gate_specs():
    from bench_ctm import run_ctm
    from bench_ctpf import run_ctpf
    from bench_dtm import run_dtm
    from bench_filtered import run_filtered
    from bench_hmtm import run_hmtm
    return [
        # on-chip kernel correctness rides the perf gate (VERDICT r3 #9)
        (run_kernel_check, 1.0, False),
        (lambda: run_lda(reps=5), 600_000.0, True),    # docs/s
        (lambda: run_ctm(reps=5), 0.7, False),         # s/iter
        (lambda: run_ctpf(reps=5), 0.040, False),      # s/iter
        # secondary floors (~30% headroom over the round-3 measurements:
        # fLDA 404k docs/s / fCTM 0.97 s/iter with the fused kappa-lane
        # gather, DTM 0.51 s/iter, HMTM 0.42 s/iter with the
        # converged-lane early exit)
        (lambda: run_filtered("flda", reps=5), 290_000.0, True),
        (lambda: run_filtered("fctm", reps=5), 1.3, False),
        (lambda: run_dtm(reps=5), 0.8, False),
        (lambda: run_hmtm(reps=5), 0.65, False),
    ]


def _pin_gate_env():
    """The gate floors are calibrated to the three STANDARD configs —
    a stray BENCH_* override would fail (or worse, pass) the gate on a
    different workload, so --assert strips them and says so."""
    stray = [k for k in list(os.environ) if k.startswith("BENCH_")]
    for k in stray:
        del os.environ[k]
    if stray:
        print(f"bench --assert: ignoring {','.join(sorted(stray))} "
              "(floors are calibrated to the standard configs)",
              file=sys.stderr)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv

    if "--assert" in argv:
        _pin_gate_env()
        failures = []
        for run, floor, higher in _gate_specs():
            r = run()
            ok = (r["value"] >= floor) if higher else (r["value"] <= floor)
            r["floor"] = floor
            r["ok"] = ok
            print(json.dumps(r))
            if not ok:
                failures.append(f"{r['metric']}={r['value']} "
                                f"{'<' if higher else '>'} floor {floor}")
        if failures:
            print("PERF REGRESSION: " + "; ".join(failures), file=sys.stderr)
            sys.exit(1)
        return

    if "--sweep-dist" in argv:
        for skew in (1.5, 3.0, 5.0):
            print(json.dumps(run_lda(skew=skew)))
        return

    print(json.dumps(run_lda()))


if __name__ == "__main__":
    main()
