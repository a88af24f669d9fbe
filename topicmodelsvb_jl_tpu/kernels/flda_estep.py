"""Fused fLDA E-step Pallas kernel.

The filtered-LDA inner loop (fLDA.jl:181-207) on the LDA kernel's
pattern (kernels/lda_estep.py): a tile of documents' gathered
``log beta[:, terms]`` and background ``kappa[terms]`` stay VMEM-resident
across the whole viter fixpoint.  Unlike plain LDA the per-token Bernoulli
responsibility ``tau`` re-weights log-beta every iteration
(phi ∝ exp(tau·logβ + Elogtheta), fLDA.jl:204-207), so the softmax's
exp over the [docs, tokens, K] tile is irreducible — the win here is
IO (the tile is read once, not once per inner iteration) and the fused
tau update ``tau = eta / (eta + (1−eta)·kappa_j·exp(−Σ_k φ·logβ))``
(fLDA.jl:195-200).

Padding conventions (Kp = K rounded to 128):
* logbeta_d padded with 0 on pad-topic lanes (safe: tau·0 = 0);
* Elogtheta pinned to −1e30 on pad lanes so softmax zeroes them;
* alpha padded with 0; padded docs masked by doc_mask like LDA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.numerics import EPSILON
from .lda_estep import digamma_series

_MAX_TILE_ELEMS = 16 * 128 * 128
_NEG = -1e30


def _estep_kernel(lb_ref, kap_ref, counts_ref, mask_ref, alpha_ref, eta_ref,
                  gamma_ref, el_ref, elo_ref, tau_ref, tauo_ref,
                  gamma_out, el_out, elo_out, tau_out, tauo_out,
                  wb_out, wk_out,
                  *, viter: int, vtol: float, n_topics: int):
    lb = lb_ref[:]                       # [Bt, L, Kp] log(beta+eps); 0 on pad k
    kap = kap_ref[:]                     # [Bt, L] kappa[terms]
    counts = counts_ref[:]               # [Bt, L]
    alpha = alpha_ref[:]                 # [1, Kp]
    eta = eta_ref[0, 0]
    eps = jnp.float32(EPSILON)
    kp = alpha.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
    kmask = (lane < n_topics).astype(lb.dtype)
    is_last = (lane == kp - 1).astype(lb.dtype)
    negpad = (1.0 - kmask) * _NEG        # [1, Kp] −1e30 on pad lanes
    vtol2 = jnp.float32(vtol) * jnp.float32(vtol)

    def phi_parts(el, tau):
        # phi ∝ exp(tau·logβ + El), normalised over K (fLDA.jl:204-207)
        logits = tau[:, :, None] * lb + el[:, None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1)
        return p, s

    def body(carry):
        i, gamma, el, elo, tau, tauo, active = carry
        p, s = phi_parts(el, tau)
        # update_tau! (fLDA.jl:195-200): needs Σ_k φ·logβ
        philog = jnp.sum(p * lb, axis=-1) / s                 # [Bt, L]
        tau_new = eta / (eta + (1.0 - eta) * kap * jnp.exp(-philog) + eps)
        # update_gamma! (fLDA.jl:188-191)
        cs = counts / s
        gamma_new = alpha + jnp.sum(p * cs[:, :, None], axis=1) + eps
        # update_Elogtheta! (fLDA.jl:181-184); pad lanes pinned to −1e30
        gsum = jnp.sum(gamma_new * kmask, axis=-1, keepdims=True)
        if n_topics < kp:
            dg = digamma_series(gamma_new * (1.0 - is_last) + gsum * is_last)
            dg_sum = jnp.sum(dg * is_last, axis=-1, keepdims=True)
        else:
            dg = digamma_series(gamma_new)
            dg_sum = digamma_series(gsum)
        el_new = (dg - dg_sum) * kmask + negpad
        upd = active > 0.0
        updL = upd  # [Bt, 1] broadcasts over L and Kp alike
        gamma2 = jnp.where(upd, gamma_new, gamma)
        elo2 = jnp.where(upd, el, elo)
        el2 = jnp.where(upd, el_new, el)
        tauo2 = jnp.where(updL, tau, tauo)
        tau2 = jnp.where(updL, tau_new, tau)
        d = (el2 - elo2) * kmask
        dist2 = jnp.sum(d * d, axis=-1, keepdims=True)
        active2 = jnp.where(dist2 >= vtol2, active, 0.0)
        return i + 1, gamma2, el2, elo2, tau2, tauo2, active2

    def cond(carry):
        i, _, _, _, _, _, active = carry
        return (i < viter) & (jnp.sum(active) > 0.0)

    carry0 = (jnp.int32(0), gamma_ref[:], el_ref[:], elo_ref[:],
              tau_ref[:], tauo_ref[:], mask_ref[:])
    _, gamma, el, elo, tau, tauo, _ = jax.lax.while_loop(cond, body, carry0)

    gamma_out[:] = gamma
    el_out[:] = el
    elo_out[:] = elo
    tau_out[:] = tau
    tauo_out[:] = tauo
    # stats: phi from (tau_old, Elogtheta_old), weights use CURRENT tau
    # (fLDA.jl:160-177)
    p, s = phi_parts(elo, tauo)
    wb_out[:] = p * ((tau * counts) / s)[:, :, None]
    wk_out[:] = (1.0 - tau) * counts


def flda_estep(logbeta_d, kappa_d, counts, doc_mask, alpha, eta,
               gamma, El, El_old, tau, tau_old,
               *, viter: int, vtol: float, n_topics: int,
               interpret: bool = False):
    """Run the fused fLDA E-step over a chunk (see module docstring)."""
    B, L, Kp = logbeta_d.shape
    assert Kp % 128 == 0, Kp
    bt_cap = max(8, _MAX_TILE_ELEMS // (L * Kp))
    bt = 8
    while bt * 2 <= min(bt_cap, 256) and B % (bt * 2) == 0:
        bt *= 2
    assert B % bt == 0 and bt % 8 == 0, (B, bt)
    grid = (B // bt,)

    kern = functools.partial(_estep_kernel, viter=viter, vtol=vtol,
                             n_topics=n_topics)
    f32 = logbeta_d.dtype
    out_shapes = (
        jax.ShapeDtypeStruct((B, Kp), f32),      # gamma
        jax.ShapeDtypeStruct((B, Kp), f32),      # El
        jax.ShapeDtypeStruct((B, Kp), f32),      # El_old
        jax.ShapeDtypeStruct((B, L), f32),       # tau
        jax.ShapeDtypeStruct((B, L), f32),       # tau_old
        jax.ShapeDtypeStruct((B, L, Kp), f32),   # w_beta
        jax.ShapeDtypeStruct((B, L), f32),       # w_kappa
    )
    vec = lambda shp: pl.BlockSpec(shp, lambda i: (i,) + (0,) * (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    in_specs = [
        vec((bt, L, Kp)), vec((bt, L)), vec((bt, L)), vec((bt, 1)),
        pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        scalar,
        vec((bt, Kp)), vec((bt, Kp)), vec((bt, Kp)),
        vec((bt, L)), vec((bt, L)),
    ]
    out_specs = (vec((bt, Kp)), vec((bt, Kp)), vec((bt, Kp)),
                 vec((bt, L)), vec((bt, L)), vec((bt, L, Kp)), vec((bt, L)))
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(logbeta_d, kappa_d, counts, doc_mask[:, None], alpha[None, :],
      jnp.reshape(eta, (1, 1)), gamma, El, El_old, tau, tau_old)
