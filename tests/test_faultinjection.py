"""Fault injection: SIGKILL a training process, resume from the last
auto-checkpoint, reproduce the uninterrupted ELBO trace (SURVEY §5.3).

The pieces this closes end-to-end: the Trainer's checkpoint_every
cadence (engine.py), atomic checkpoint writes (api._trainer_kw's
tmp+rename callback), checkpoint portability (checkpoint.py), and
exact ELBO-trace continuation on resume.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_WORKER = os.path.join(_HERE, "faultinject_worker.py")


def _wait_for_checkpoints(ckpt_dir, min_count, timeout_s=240):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if os.path.isdir(ckpt_dir):
            done = [f for f in os.listdir(ckpt_dir)
                    if f.startswith("ckpt_iter") and not f.endswith(".tmp")]
            if len(done) >= min_count:
                return sorted(done)
        time.sleep(0.05)
    raise AssertionError("worker produced no checkpoints in time")


def test_sigkill_and_resume_reproduces_elbo_trace(tmp_path):
    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu import checkpoint as ckptlib
    from topicmodelsvb_jl_tpu.api import LDA
    from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig

    ckpt_dir = str(tmp_path / "ckpts")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.Popen(
        [sys.executable, _WORKER, ckpt_dir],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        env=env, cwd=os.path.dirname(_HERE), text=True,
    )
    try:
        # let a few checkpoints land, then kill without warning mid-run
        _wait_for_checkpoints(ckpt_dir, min_count=2)
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == -signal.SIGKILL

    files = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_iter") and not f.endswith(".tmp"))
    assert files, "no completed checkpoint survived the kill"
    last = files[-1]
    k_ckpt = int(last.replace("ckpt_iter", ""))

    # uninterrupted reference run, identical config/seed
    total = k_ckpt + 4
    corp = tm.synth_corpus(M=64, V=40, K=3, seed=21)
    rt = RuntimeConfig(chunk_docs=8, dtype="float64", pad_multiple=8)
    ref = LDA(corp, 3, runtime=rt, seed=9)
    ref.train(iter=total, tol=0.0, checkelbo=1, printelbo=False)
    ref_trace = [r.elbo for r in ref.trainer.trace if r.elbo is not None]

    # resume from the killed run's last checkpoint
    resumed = ckptlib.load(os.path.join(ckpt_dir, last), corp)
    resumed.train(iter=total - k_ckpt, tol=0.0, checkelbo=1, printelbo=False)
    res_trace = [r.elbo for r in resumed.trainer.trace if r.elbo is not None]

    # the resumed trace must continue the uninterrupted trajectory exactly
    np.testing.assert_allclose(res_trace, ref_trace[k_ckpt:], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(resumed.beta), np.asarray(ref.beta),
                               rtol=1e-10)
