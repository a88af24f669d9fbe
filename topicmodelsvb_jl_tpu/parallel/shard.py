"""shard_map wiring for model train steps."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # JAX ≥ 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def dp_jit(fn, mesh, state_spec, n_data_args: int, data_axis: str = "data",
           n_repl_args: int = 0, out_spec=None):
    """jit(shard_map(fn)) with: state replicated-per-spec, ``n_data_args``
    doc-major args sharded over ``data_axis``, then ``n_repl_args``
    replicated scalars.  ``out_spec`` defaults to ``state_spec``."""
    dspec = P(data_axis)
    in_specs = (state_spec,) + (dspec,) * n_data_args + (P(),) * n_repl_args
    out = state_spec if out_spec is None else out_spec
    try:
        mapped = shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out,
                           check_vma=False)
    except TypeError:  # older/newer kwarg spelling
        mapped = shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out,
                           check_rep=False)
    return jax.jit(mapped)


def tp_normalize_rows(stat, vocab_axis, axes):
    """Reduce a [rows, K] sufficient statistic whose parameter storage is
    sharded over ``vocab_axis``: reduce_scatter over the storage axis
    (each shard keeps its rows), psum over the remaining data axes, and
    return (local_stat [rows/n, K], psum'd per-topic row sums [K]).

    The row-sum runs over the FULL row axis, so normalising by it yields
    the same stochastic rows as the unsharded update.  Shared by the
    LDA/fLDA/CTM/fCTM beta updates and CTPF's alef/he (SURVEY §2.3's
    sufficient-statistics all-reduce under TP).
    """
    local = jax.lax.psum_scatter(stat, vocab_axis, scatter_dimension=0,
                                 tiled=True)
    rest = tuple(ax for ax in axes if ax != vocab_axis)
    if rest:
        local = jax.lax.psum(local, rest)
    row_sum = jax.lax.psum(jnp.sum(local, axis=0), vocab_axis)
    return local, row_sum
