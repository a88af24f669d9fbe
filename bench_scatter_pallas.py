"""Measure per-row cost of a Pallas VMEM-resident scatter-accumulate vs
XLA's HBM scatter (ROADMAP scatter-study follow-up). Data generated on
device (the dev tunnel makes H2D transfers glacial); each variant runs
repeatedly inside one jit to amortize dispatch latency.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Vs, K, T_TILE, N_TILES, REPS = 8192, 128, 2048, 64, 20   # 131k rows/pass
T = T_TILE * N_TILES

key = jax.random.PRNGKey(0)
ids_d = jax.random.randint(key, (T,), 0, Vs, dtype=jnp.int32)
w_d = jax.random.uniform(jax.random.PRNGKey(1), (N_TILES, T_TILE, K),
                         dtype=jnp.float32)


def kern(ids_ref, w_ref, out_ref, acc):
    i0 = pl.program_id(0)

    @pl.when(i0 == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    def body(i, carry):
        v = ids_ref[i]
        acc[pl.ds(v, 1), :] = acc[pl.ds(v, 1), :] + w_ref[i, :][None, :]
        return carry

    jax.lax.fori_loop(0, T_TILE, body, 0)

    @pl.when(i0 == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc[...]


def pallas_once(ids, w):
    return pl.pallas_call(
        kern,
        grid=(N_TILES,),
        in_specs=[
            pl.BlockSpec((T_TILE,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, T_TILE, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Vs, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Vs, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Vs, K), jnp.float32)],
    )(ids, w)


def xla_once(ids, w):
    return jax.ops.segment_sum(w.reshape(-1, K), ids, num_segments=Vs)


def repeat(once):
    @jax.jit
    def run(ids, w):
        def body(i, acc):
            return acc + once(ids, w * (1.0 + 1e-9 * i))  # defeat CSE
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((Vs, K)))
    return run


def timed(f, n=3):
    r = f(ids_d, w_d); r.block_until_ready()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(ids_d, w_d); float(r.sum())
        best = min(best, time.perf_counter() - t0)
    return best, r


tx, rx = timed(repeat(xla_once))
print(f"XLA HBM scatter    : {tx/REPS*1e3:7.2f} ms/pass "
      f"({tx/REPS/T*1e9:.1f} ns/row)")
try:
    tp, rp = timed(repeat(pallas_once))
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rx),
                               rtol=2e-4, atol=1e-2)
    print(f"pallas VMEM scatter: {tp/REPS*1e3:7.2f} ms/pass "
          f"({tp/REPS/T*1e9:.1f} ns/row)")
except Exception as e:
    print("pallas scatter failed:", type(e).__name__, str(e)[:300])
