"""Fused LDA E-step Pallas kernel.

TPU-native replacement for the reference's gpuLDA inner-loop kernel set
(``LDA_PHI_c``/``LDA_PHI_NORM_c``/``LDA_GAMMA_c``/``LDA_ELOGTHETA_c``,
gpuLDA.jl:206-333) — but where the reference launches 4+ OpenCL kernels
per inner iteration (each round-tripping device memory), this kernel
keeps a tile of documents' gathered ``beta[:, terms]`` resident in VMEM
across the *entire* viter fixpoint (LDA.jl:171-179), then emits the
final ``phi .* counts`` sufficient-statistic rows for the M-step scatter
(LDA.jl:129-132).

Two deliberate numerical choices, both taken from the reference itself:

* phi is computed **multiplicatively** — ``phi ∝ beta[:, terms] .*
  exp(Elogtheta)`` with an EPSILON underflow guard — exactly the CPU
  reference's update (LDA.jl:150-154 under ``@positive``), not in log
  space.  The only transcendental per inner iteration is ``exp`` on the
  tiny [docs, K] Elogtheta tile; the [docs, tokens, K] phi tile is pure
  multiply/reduce on the VPU.
* digamma is computed in-kernel with the shifted asymptotic series —
  the same approach as the reference's hand-rolled OpenCL device
  digamma (``DIGAMMA_c``, utils.jl:21-53); Mosaic has no digamma
  primitive.

Per-document convergence masking reproduces the reference's per-doc
``break`` (LDA.jl:175) exactly: a converged document's state freezes
while the rest of its tile keeps iterating.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.numerics import EPSILON

# Keep each [Bt, L, Kp] f32 tile at or under this many elements so the
# working set (input tile + w tile + temporaries, double-buffered) stays
# well inside the ~16 MB/core VMEM budget.
_MAX_TILE_ELEMS = 32 * 128 * 128

# smallest tile is 8 docs; beyond this token-axis extent even that tile
# (input + stat output, double-buffered) would blow the VMEM budget —
# callers fall back to the XLA body (very long documents should use
# token-axis sharding instead, models/lda.py seq_axis)
_VMEM_BUDGET_BYTES = 12_500_000


def fits_vmem(l_elems: int, Kp: int) -> bool:
    """True when an 8-doc tile with ``l_elems`` token slots fits VMEM."""
    return 8 * l_elems * Kp * 4 * 4 <= _VMEM_BUDGET_BYTES


def digamma_series(x: jax.Array) -> jax.Array:
    """ψ(x) for x > 0 via recurrence + asymptotic series (f32-accurate).

    ψ(x) = ψ(x+8) − Σ_{i=0..7} 1/(x+i);  for t ≥ 8:
    ψ(t) ≈ ln t − 1/(2t) − 1/(12t²) + 1/(120t⁴) − 1/(252t⁶).
    Truncation error at t=8 is ~2.5e-10 — below f32 resolution.  Same
    construction as the reference's OpenCL ``DIGAMMA_c`` (utils.jl:21-53).
    """
    acc = jnp.zeros_like(x)
    for i in range(8):
        acc = acc + 1.0 / (x + float(i))
    t = x + 8.0
    inv = 1.0 / t
    inv2 = inv * inv
    series = (
        jnp.log(t) - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 * (1.0 / 252.0)))
    )
    return series - acc


def _estep_kernel(beta_d_ref, counts_ref, mask_ref, alpha_ref,
                  gamma_ref, el_ref, elo_ref,
                  gamma_out, el_out, elo_out, w_out,
                  *, viter: int, vtol: float, n_topics: int):
    """One tile of documents: viter fixpoint + final M-step stat rows."""
    beta_d = beta_d_ref[:]              # [Bt, L, Kp]  (beta+eps)[:, terms]; 0 on pad topics
    counts = counts_ref[:]              # [Bt, L]      0 on padded slots
    alpha = alpha_ref[:]                # [1, Kp]      0 on padded topics
    eps = jnp.float32(EPSILON)
    kp = alpha.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
    # padded-topic lanes are pinned to Elogtheta = 0 so they never move
    # the per-doc convergence distance (real lanes: iota < n_topics)
    kmask = (lane < n_topics).astype(beta_d.dtype)
    # the per-doc gamma row-sum rides in the last padded lane so a single
    # digamma-series evaluation serves both ψ(γ_k) and ψ(Σγ) — the series
    # is ~22 VPU instructions and the [docs, K] tiles are tiny, so
    # instruction count, not element count, is what this kernel pays for
    is_last = (lane == kp - 1).astype(beta_d.dtype)
    vtol2 = jnp.float32(vtol) * jnp.float32(vtol)

    def body(carry):
        i, gamma, el, elo, active = carry              # active: [Bt, 1] f32
        # phi ∝ (beta[:,terms]+eps) .* exp(Elogtheta) (LDA.jl:150-154),
        # but phi itself is never materialised: the normaliser s and the
        # gamma statistic q are two fused multiply-reduce passes over the
        # VMEM-resident beta_d tile —
        #   s_l = Σ_k beta_d[l,k]·e[k]          (lane reduce)
        #   q_k = Σ_l (c_l/s_l)·beta_d[l,k]     (sublane reduce)
        #   gamma_k = alpha_k + e_k·q_k          (update_gamma!, LDA.jl:143-146)
        e = jnp.exp(el)                                # [Bt, Kp]
        s = jnp.sum(beta_d * e[:, None, :], axis=-1)   # [Bt, L]
        cs = counts / s                                # [Bt, L]
        q = jnp.sum(beta_d * cs[:, :, None], axis=1)   # [Bt, Kp]
        gamma_new = alpha + e * q + eps
        # update_Elogtheta! (LDA.jl:136-139), one digamma evaluation:
        # the row-sum is smuggled into the unused last padded lane
        gsum = jnp.sum(gamma_new, axis=-1, keepdims=True)
        if n_topics < kp:
            dg = digamma_series(gamma_new * (1.0 - is_last) + gsum * is_last)
            dg_sum = jnp.sum(dg * is_last, axis=-1, keepdims=True)
        else:  # no padded lane to borrow — two evaluations
            dg = digamma_series(gamma_new)
            dg_sum = digamma_series(gsum)
        el_new = (dg - dg_sum) * kmask
        upd = active > 0.0
        gamma2 = jnp.where(upd, gamma_new, gamma)
        elo2 = jnp.where(upd, el, elo)
        el2 = jnp.where(upd, el_new, el)
        # per-doc break: ‖ΔElogtheta‖ < vtol (LDA.jl:175), squared form
        d = el2 - elo2
        dist2 = jnp.sum(d * d, axis=-1, keepdims=True)
        active2 = jnp.where(dist2 >= vtol2, active, 0.0)
        return i + 1, gamma2, el2, elo2, active2

    def cond(carry):
        # tile-level early exit once every doc here converged — the
        # vector analogue of the reference's per-doc break (LDA.jl:175)
        i, _, _, _, active = carry
        return (i < viter) & (jnp.sum(active) > 0.0)

    gamma0 = gamma_ref[:]
    el0 = el_ref[:]
    elo0 = elo_ref[:]
    active0 = mask_ref[:]                              # [Bt, 1] 1.0 = active
    _, gamma, el, elo, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), gamma0, el0, elo0, active0))

    gamma_out[:] = gamma
    el_out[:] = el
    elo_out[:] = elo
    # M-step stat uses phi(beta, Elogtheta_old) — the value phi held when
    # the doc's fixpoint stopped (same warm-start identity as LDA.jl:87).
    e = jnp.exp(elo)
    s = jnp.sum(beta_d * e[:, None, :], axis=-1)
    w_out[:] = beta_d * (e[:, None, :] * (counts / s)[:, :, None])


def lda_estep(beta_d, counts, doc_mask, alpha,
              gamma, El, El_old, *, viter: int, vtol: float,
              n_topics: int, interpret: bool = False):
    """Run the fused E-step over a chunk of documents.

    Args (all padded to Kp = topic axis rounded up to 128):
      beta_d:   [B, L, Kp]  gathered (beta+EPSILON)[:, terms]; 0 on padded
                 topics (the reference's @boink guard folded into the table)
      counts:   [B, L]      token counts, 0 on padding
      doc_mask: [B]         1 for real documents
      alpha:    [Kp]        Dirichlet hyperparameter, 0 on padded topics
      gamma/El/El_old: [B, Kp] per-doc variational state, zero-padded
    Returns (gamma, El, El_old, w) with w = phi·counts [B, L, Kp].
    """
    B, L, Kp = beta_d.shape
    assert Kp % 128 == 0, Kp
    # largest doc-tile that is a multiple of 8, divides B, and keeps the
    # [bt, L, Kp] working set inside the VMEM budget
    bt_cap = max(8, _MAX_TILE_ELEMS // (L * Kp))
    bt = 8
    while bt * 2 <= min(bt_cap, 256) and B % (bt * 2) == 0:
        bt *= 2
    assert B % bt == 0 and bt % 8 == 0, (B, bt)
    grid = (B // bt,)

    kern = functools.partial(_estep_kernel, viter=viter, vtol=vtol,
                             n_topics=n_topics)
    out_shapes = (
        jax.ShapeDtypeStruct((B, Kp), beta_d.dtype),
        jax.ShapeDtypeStruct((B, Kp), beta_d.dtype),
        jax.ShapeDtypeStruct((B, Kp), beta_d.dtype),
        jax.ShapeDtypeStruct((B, L, Kp), beta_d.dtype),
    )
    vec = lambda shp: pl.BlockSpec(shp, lambda i: (i,) + (0,) * (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    in_specs = [
        vec((bt, L, Kp)),
        vec((bt, L)),
        vec((bt, 1)),
        pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        vec((bt, Kp)),
        vec((bt, Kp)),
        vec((bt, Kp)),
    ]
    out_specs = (vec((bt, Kp)), vec((bt, Kp)), vec((bt, Kp)), vec((bt, L, Kp)))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(beta_d, counts, doc_mask[:, None], alpha[None, :], gamma, El, El_old)
