"""Worker for the SIGKILL fault-injection test (SURVEY §5.3).

Trains LDA with the auto-checkpoint cadence enabled and NO iteration
limit it could realistically reach — the parent test watches the
checkpoint directory and SIGKILLs this process mid-run, then resumes
from the last (atomically written) checkpoint.

Usage: python faultinject_worker.py <ckpt_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ckpt_dir = sys.argv[1]

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import topicmodelsvb_jl_tpu as tm  # noqa: E402
from topicmodelsvb_jl_tpu.api import LDA  # noqa: E402
from topicmodelsvb_jl_tpu.utils.config import RuntimeConfig  # noqa: E402

corp = tm.synth_corpus(M=64, V=40, K=3, seed=21)
rt = RuntimeConfig(chunk_docs=8, dtype="float64", pad_multiple=8,
                   checkpoint_every=2, checkpoint_dir=ckpt_dir)
model = LDA(corp, 3, runtime=rt, seed=9)
# tol=0 with f64 monotone ELBO never early-stops; 100000 iterations is
# far beyond what the parent allows before the SIGKILL
model.train(iter=100_000, tol=0.0, checkelbo=1, printelbo=False)
