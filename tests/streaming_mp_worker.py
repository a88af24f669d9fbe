"""Worker for the multi-controller STREAMING test (VERDICT r3 #1).

Launched by tests/test_streaming_multiprocess.py as N OS processes.
Each process owns a batch-strided document shard (its L-row slice of
every global batch + the host per-doc state for those rows), streams
its own batches through its local device, and
the sufficient statistics / bound reduce across processes per sweep —
the composition of the two flagship distributed capabilities the
round-3 guard made mutually exclusive (streaming.py, _init_common).

Usage: python streaming_mp_worker.py <proc_id> <nproc> <port> <mode> [ckpt_dir]
  mode ∈ {lda, ctpf, lda_online}
Prints one JSON line per process (the test reads process 0's).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
mode = sys.argv[4]
ckpt_dir = sys.argv[5] if len(sys.argv) > 5 else None

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from topicmodelsvb_jl_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"localhost:{port}", nproc, proc_id)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np  # noqa: E402

import topicmodelsvb_jl_tpu as tm  # noqa: E402
from topicmodelsvb_jl_tpu.ops.packing import pack_corpus  # noqa: E402
from topicmodelsvb_jl_tpu.streaming import (  # noqa: E402
    StreamingCTPF, StreamingLDA)

if mode == "ctpf":
    corp = tm.synth_corpus(M=48, V=30, K=3, U=12, seed=6, mean_readers=3)
    packed = pack_corpus(corp, pad_multiple=8, docs_multiple=16,
                         with_readers=True, dtype=np.float64)
    s = StreamingCTPF(packed, 3, batch_docs=24, chunk_docs=6,
                      dtype="float64", seed=9)
    s.train(iter=3, tol=0.0, checkelbo=1, printelbo=False,
            checkpoint_every=(3 if ckpt_dir else 0), checkpoint_dir=ckpt_dir)
    glob = np.asarray(s.alef)
else:
    corp = tm.synth_corpus(M=64, V=40, K=3, seed=5)
    packed = pack_corpus(corp, pad_multiple=8, docs_multiple=16,
                         dtype=np.float64)
    mesh = None
    if mode == "lda_mesh":
        # per-process LOCAL mesh: streaming x in-process DP composed
        # with the cross-process reduction
        from topicmodelsvb_jl_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(local=True, axis_names=("data",))
        assert mesh.devices.size == 2, mesh.devices
    s = StreamingLDA(packed, 3, batch_docs=32, chunk_docs=8,
                     dtype="float64", seed=3, mesh=mesh)
    if mode == "lda_online":
        s.train_online(epochs=2, tau0=4.0, kappa=0.7, checkelbo=1,
                       printelbo=False, shuffle_seed=11)
    else:
        s.train(iter=3, tol=0.0, checkelbo=1, printelbo=False,
                checkpoint_every=(3 if ckpt_dir else 0),
                checkpoint_dir=ckpt_dir)
    glob = np.asarray(s.beta)

assert s.M_rows * nproc == packed.M_pad
g_rows = s._local_to_global_rows(s.M_rows, s.batch_docs,
                                 s._batch_docs_global, proc_id)
print(json.dumps({
    "proc": proc_id,
    "g_rows": g_rows.tolist(),
    "trace": [[k, e, d] for k, e, d in s.trace],
    "glob": glob.tolist(),
    # this process's shard of the per-doc state (checks the scatter)
    "gamma0": np.asarray(getattr(s, s._doc_state[0])).tolist(),
}), flush=True)
