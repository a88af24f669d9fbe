"""Multi-host initialisation and corpus sharding helpers.

The reference is strictly single-process (SURVEY §2.3); this module is
the build's multi-host entry point.  Workflow on an N-host TPU slice:

    import topicmodelsvb_jl_tpu as tm
    from topicmodelsvb_jl_tpu.parallel import multihost

    multihost.initialize()                  # jax.distributed handshake
    corp = tm.readcorp(...)                 # every host loads/receives the corpus
    model = tm.LDA(corp, K)                 # mesh spans all hosts' devices
    model.train(...)

Every host runs the same program; `make_mesh` already builds the mesh
over `jax.devices()` (global across hosts once initialised), and the
shard_map'd steps place each host's addressable shard of the doc axis
locally.  Sufficient-statistic psums ride ICI within a slice and DCN
across slices — XLA's collective layer is the backend (SURVEY §5.8).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` with env-var defaults.

    On Cloud TPU the arguments are auto-detected; pass them explicitly
    for other launchers. Safe to call once per process, before any
    device computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_initialized() -> bool:
    try:
        return jax.process_count() > 1 or jax._src.distributed.global_state.client is not None
    except Exception:
        return False


def process_doc_range(M: int) -> tuple:
    """[start, end) of the documents this host should own under the
    default contiguous doc sharding (useful for host-side corpus IO
    when each host reads only its own shard)."""
    n = jax.process_count()
    i = jax.process_index()
    per = -(-M // n)
    return i * per, min((i + 1) * per, M)
