"""Multi-controller streaming (VERDICT r3 #1): 2 OS processes, each
owning the batch-strided half of the corpus (its slice of every global
batch + the host per-doc state for those rows), streaming its own
batches — trajectory must equal the single-process streaming run of the
identical GLOBAL configuration to 1e-10, for both StreamingLDA and
StreamingCTPF, batch and online modes; the directory checkpoint written
by the 2-process run must restore single-process.
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
_WORKER = os.path.join(_HERE, "streaming_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(mode, ckpt_dir=None, local_devices=1):
    nproc, port = 2, _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if local_devices > 1:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count="
                            f"{local_devices}").strip()
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), str(nproc), str(port), mode]
        + ([ckpt_dir] if ckpt_dir else []),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd=os.path.dirname(_HERE), text=True) for i in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def _single_lda(online=False):
    import jax

    jax.config.update("jax_enable_x64", True)
    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu.ops.packing import pack_corpus
    from topicmodelsvb_jl_tpu.streaming import StreamingLDA

    corp = tm.synth_corpus(M=64, V=40, K=3, seed=5)
    packed = pack_corpus(corp, pad_multiple=8, docs_multiple=16,
                         dtype=np.float64)
    s = StreamingLDA(packed, 3, batch_docs=32, chunk_docs=8,
                     dtype="float64", seed=3)
    if online:
        s.train_online(epochs=2, tau0=4.0, kappa=0.7, checkelbo=1,
                       printelbo=False, shuffle_seed=11)
    else:
        s.train(iter=3, tol=0.0, checkelbo=1, printelbo=False)
    return s, packed


def test_two_process_streaming_lda_matches_single(tmp_path):
    ckpt_dir = str(tmp_path / "ck")
    outs = _run_pair("lda", ckpt_dir)
    # both processes agree bitwise on globals and the reduced trace
    np.testing.assert_array_equal(outs[0]["glob"], outs[1]["glob"])
    np.testing.assert_array_equal(
        [t[1] for t in outs[0]["trace"]], [t[1] for t in outs[1]["trace"]])
    # shards are the disjoint batch-strided halves (L=16, G=32)
    assert outs[0]["g_rows"] == [*range(0, 16), *range(32, 48)]
    assert outs[1]["g_rows"] == [*range(16, 32), *range(48, 64)]

    single, packed = _single_lda()
    strace = [e for _, e, _ in single.trace]
    mtrace = [t[1] for t in outs[0]["trace"]]
    np.testing.assert_allclose(mtrace, strace, rtol=1e-10)
    np.testing.assert_allclose(outs[0]["glob"], np.asarray(single.beta),
                               rtol=1e-10)
    # per-doc state: each process's shard matches the single run's rows
    g = np.asarray(single.gamma)
    np.testing.assert_allclose(outs[0]["gamma0"], g[outs[0]["g_rows"]],
                               rtol=1e-10)
    np.testing.assert_allclose(outs[1]["gamma0"], g[outs[1]["g_rows"]],
                               rtol=1e-10)

    # the 2-process DIRECTORY checkpoint restores in THIS single process
    from topicmodelsvb_jl_tpu import streaming as st

    done = sorted(d for d in os.listdir(ckpt_dir)
                  if d.startswith("ckpt_iter") and not d.endswith(".tmp"))
    assert done
    path = os.path.join(ckpt_dir, done[-1])
    assert os.path.isdir(path)
    assert os.path.exists(os.path.join(path, "manifest.json"))
    loaded = st.load(path, packed)
    np.testing.assert_allclose(np.asarray(loaded.beta),
                               np.asarray(single.beta), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(loaded.gamma), g, rtol=1e-10)


def test_two_process_streaming_lda_local_mesh_matches_single():
    """Streaming x in-process DP x cross-process reduction: each of the
    2 processes sweeps its shard over a LOCAL 2-device mesh; trajectory
    must still equal the plain single-process run."""
    outs = _run_pair("lda_mesh", local_devices=2)
    single, _ = _single_lda()
    np.testing.assert_allclose([t[1] for t in outs[0]["trace"]],
                               [e for _, e, _ in single.trace], rtol=1e-10)
    np.testing.assert_allclose(outs[0]["glob"], np.asarray(single.beta),
                               rtol=1e-10)


def test_two_process_streaming_lda_online_matches_single():
    outs = _run_pair("lda_online")
    single, _ = _single_lda(online=True)
    np.testing.assert_allclose([t[1] for t in outs[0]["trace"]],
                               [e for _, e, _ in single.trace], rtol=1e-10)
    np.testing.assert_allclose(outs[0]["glob"], np.asarray(single.beta),
                               rtol=1e-10)


def test_two_process_streaming_ctpf_matches_single():
    import jax

    jax.config.update("jax_enable_x64", True)
    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu.ops.packing import pack_corpus
    from topicmodelsvb_jl_tpu.streaming import StreamingCTPF

    outs = _run_pair("ctpf")
    corp = tm.synth_corpus(M=48, V=30, K=3, U=12, seed=6, mean_readers=3)
    packed = pack_corpus(corp, pad_multiple=8, docs_multiple=16,
                         with_readers=True, dtype=np.float64)
    single = StreamingCTPF(packed, 3, batch_docs=24, chunk_docs=6,
                           dtype="float64", seed=9)
    single.train(iter=3, tol=0.0, checkelbo=1, printelbo=False)
    np.testing.assert_allclose([t[1] for t in outs[0]["trace"]],
                               [e for _, e, _ in single.trace], rtol=1e-10)
    np.testing.assert_allclose(outs[0]["glob"], np.asarray(single.alef),
                               rtol=1e-10)
    g = np.asarray(getattr(single, single._doc_state[0]))
    np.testing.assert_allclose(outs[0]["gamma0"], g[outs[0]["g_rows"]],
                               rtol=1e-10)
    np.testing.assert_allclose(outs[1]["gamma0"], g[outs[1]["g_rows"]],
                               rtol=1e-10)
