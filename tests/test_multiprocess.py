"""Real multi-process distributed training (SURVEY §4e, §5.8).

Spawns 2 OS processes (2 virtual CPU devices each → a 4-device global
mesh) that train LDA through parallel/multihost, and asserts the
trajectory equals a single-process 4-device run of the identical
configuration.  This exercises what the in-process virtual mesh cannot:
the jax.distributed coordinator handshake, non-addressable-shard data
placement, and cross-process sufficient-statistic psums.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

import pytest

pytestmark = pytest.mark.slow  # heavy: real OS processes

_HERE = os.path.dirname(os.path.abspath(__file__))
_WORKER = os.path.join(_HERE, "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(proc_id: int, nproc: int, port: int, which: str = "lda"):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    return subprocess.Popen(
        [sys.executable, _WORKER, str(proc_id), str(nproc), str(port),
         which],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd=os.path.dirname(_HERE), text=True,
    )


def test_two_process_training_matches_single_process():
    nproc, port = 2, _free_port()
    procs = [_spawn(i, nproc, port) for i in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for o in outs:
        assert o["n_global_devices"] == 2 * nproc

    # both processes must agree bitwise on the replicated results
    np.testing.assert_array_equal(outs[0]["beta"], outs[1]["beta"])
    np.testing.assert_array_equal(outs[0]["elbo"], outs[1]["elbo"])

    # single-process run on a 4-device mesh, identical config
    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu.api import LDA
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh
    from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig

    corp = tm.synth_corpus(M=64, V=40, K=3, seed=5)
    rt = RuntimeConfig(chunk_docs=8, dtype="float64", pad_multiple=8)
    model = LDA(corp, 3, runtime=rt, mesh=make_mesh(n_devices=4), seed=3)
    model.train(iter=3, checkelbo=1, printelbo=False)
    ref_trace = [r.elbo for r in model.trainer.trace if r.elbo is not None]

    np.testing.assert_allclose(outs[0]["elbo"], ref_trace, rtol=1e-10)
    np.testing.assert_allclose(outs[0]["beta"], np.asarray(model.beta),
                               rtol=1e-10)
    np.testing.assert_allclose(outs[0]["alpha"], np.asarray(model.alpha),
                               rtol=1e-10)


def test_two_process_ctpf_matches_single_process():
    """The reader/rating machinery (CTPF) through the same real
    multi-controller path: alef/bet must match single-process."""
    nproc, port = 2, _free_port()
    procs = [_spawn(i, nproc, port, "ctpf") for i in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    np.testing.assert_array_equal(outs[0]["beta"], outs[1]["beta"])

    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu.api import CTPF
    from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh
    from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig

    corp = tm.synth_corpus(M=48, V=30, K=3, U=12, seed=6, mean_readers=3)
    rt = RuntimeConfig(chunk_docs=8, dtype="float64", pad_multiple=8)
    model = CTPF(corp, 3, runtime=rt, mesh=make_mesh(n_devices=4), seed=9)
    model.train(iter=3, checkelbo=1, printelbo=False)
    ref_trace = [r.elbo for r in model.trainer.trace if r.elbo is not None]

    np.testing.assert_allclose(outs[0]["elbo"], ref_trace, rtol=1e-10)
    np.testing.assert_allclose(outs[0]["beta"],
                               np.asarray(model.state.alef), rtol=1e-10)
    np.testing.assert_allclose(outs[0]["alpha"],
                               np.asarray(model.state.bet), rtol=1e-10)
