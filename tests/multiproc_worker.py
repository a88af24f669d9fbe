"""Worker for the real multi-process distributed test.

Launched by tests/test_multiprocess.py as N separate OS processes, each
with 2 virtual CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count=2).
Exercises the true multi-controller path the 8-virtual-device
single-process mesh cannot: the jax.distributed coordinator handshake,
global-device mesh construction, per-process data placement
(make_global_array providing only addressable shards), and cross-process
psums of the sufficient statistics (SURVEY §2.3/§5.8).

Usage: python multiproc_worker.py <proc_id> <nproc> <port> [model]
Prints one JSON line (every process; the test reads process 0's).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
which = sys.argv[4] if len(sys.argv) > 4 else "lda"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from topicmodelsvb_jl_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"localhost:{port}", nproc, proc_id)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np  # noqa: E402

import topicmodelsvb_jl_tpu as tm  # noqa: E402
from topicmodelsvb_jl_tpu.api import CTPF, LDA  # noqa: E402
from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig  # noqa: E402

# every host loads the (deterministic) corpus — the documented workflow
rt = RuntimeConfig(chunk_docs=8, dtype="float64", pad_multiple=8)
if which == "ctpf":
    corp = tm.synth_corpus(M=48, V=30, K=3, U=12, seed=6, mean_readers=3)
    model = CTPF(corp, 3, runtime=rt, seed=9)
else:
    corp = tm.synth_corpus(M=64, V=40, K=3, seed=5)
    model = LDA(corp, 3, runtime=rt, seed=3)  # mesh spans all hosts' devices
lo, hi = multihost.process_doc_range(corp.shape[0])
assert 0 <= lo < hi <= corp.shape[0]
assert model.mesh.devices.size == 2 * nproc
model.train(iter=3, checkelbo=1, printelbo=False)

trace = [r.elbo for r in model.trainer.trace if r.elbo is not None]
glob = (np.asarray(model.state.alef) if which == "ctpf"
        else np.asarray(model.beta))
aux = (np.asarray(model.state.bet) if which == "ctpf"
       else np.asarray(model.alpha))
print(json.dumps({
    "proc": proc_id,
    "n_global_devices": int(model.mesh.devices.size),
    "elbo": trace,
    "beta": glob.tolist(),   # replicated → addressable
    "alpha": aux.tolist(),
}), flush=True)
