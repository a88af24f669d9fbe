"""Fused CTPF E-step Pallas kernel.

TPU-native replacement for the gpuCTPF inner-loop kernel set
(``CTPF_PHI(_NORM)_c``/``CTPF_XI(_NORM)_c``/``CTPF_GIMEL_c``/
``CTPF_ZAYIN_c``, gpuCTPF.jl:347-661).  Like the LDA kernel, the
gathered per-token tables stay VMEM-resident across the whole viter
fixpoint (CTPF.jl:352-360), and phi/xi are computed multiplicatively:

    phi  ∝ e^{ψ(alef)}[:,terms] ⊙ e^{ψ(gimel)} / (dalet·bet)
    xi   ∝ e^{ψ(he)}[:,readers] ⊙ [e^{ψ(gimel)}/(dalet·vav) ‖
                                   e^{ψ(zayin)}/(het·vav)]      (2K softmax)

so the only transcendentals per inner iteration are exp∘digamma on the
tiny [docs, K] gimel/zayin tiles (in-kernel digamma by the same shifted
asymptotic series the reference hand-rolls in OpenCL, utils.jl:21-53).
The tables e^{ψ(alef)}ᵀ and e^{ψ(he)}ᵀ are exponentiated once per outer
iteration outside the kernel.
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


def _estep_kernel(ealef_ref, ehe_ref, counts_ref, ratings_ref, mask_ref,
                  inv_db_ref, inv_dv_ref, inv_hv_ref,
                  gi_ref, gio_ref, za_ref, zao_ref,
                  gi_out, gio_out, za_out, zao_out, wa_out, wh_out,
                  *, viter: int, vtol: float, n_topics: int,
                  c_hyper: float, g_hyper: float):
    ealef = ealef_ref[:]                 # [Bt, L, Kp] e^ψ(alef)[:,terms]; 0 pads
    ehe = ehe_ref[:]                     # [Bt, R, Kp] e^ψ(he)[:,readers]; 0 pads
    counts = counts_ref[:]               # [Bt, L]
    ratings = ratings_ref[:]             # [Bt, R]
    inv_db = inv_db_ref[:]               # [1, Kp] 1/(dalet·bet); 0 pads
    inv_dv = inv_dv_ref[:]               # [1, Kp] 1/(dalet·vav)
    inv_hv = inv_hv_ref[:]               # [1, Kp] 1/(het·vav)
    eps = jnp.float32(EPSILON)
    kp = inv_db.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
    kmask = (lane < n_topics).astype(ealef.dtype)
    vtol2 = jnp.float32(vtol) * jnp.float32(vtol)

    def factors(gi, za):
        edg_g = jnp.exp(digamma_series(gi + (1.0 - kmask)))  # pads → ψ(1)
        edg_z = jnp.exp(digamma_series(za + (1.0 - kmask)))
        qp = edg_g * inv_db                                  # pads 0 via inv_*
        qt = edg_g * inv_dv
        qb = edg_z * inv_hv
        return qp, qt, qb

    def body(carry):
        i, gi, gio, za, zao, active = carry
        qp, qt, qb = factors(gi, za)
        # phi normaliser + phi@counts (update_phi!, CTPF.jl:327-331)
        s_phi = jnp.sum(ealef * qp[:, None, :], axis=-1) + eps     # [Bt, L]
        pc = qp * jnp.sum(ealef * (counts / s_phi)[:, :, None], axis=1)
        # 2K-softmax xi (update_xi!, CTPF.jl:334-338): shared normaliser
        s_xi = jnp.sum(ehe * (qt + qb)[:, None, :], axis=-1) + eps  # [Bt, R]
        hr = jnp.sum(ehe * (ratings / s_xi)[:, :, None], axis=1)    # [Bt, Kp]
        # update_gimel!/update_zayin! (CTPF.jl:309-323)
        gi_new = (c_hyper + pc + qt * hr) * kmask
        za_new = (g_hyper + qb * hr) * kmask
        upd = active > 0.0
        gio2 = jnp.where(upd, gi, gio)
        gi2 = jnp.where(upd, gi_new, gi)
        zao2 = jnp.where(upd, za, zao)
        za2 = jnp.where(upd, za_new, za)
        # break: ‖gimel − gimel_old‖ < vtol (CTPF.jl:359)
        d = gi2 - gio2
        dist2 = jnp.sum(d * d, axis=-1, keepdims=True)
        active2 = jnp.where(dist2 >= vtol2, active, 0.0)
        return i + 1, gi2, gio2, za2, zao2, active2

    def cond(carry):
        i, _, _, _, _, active = carry
        return (i < viter) & (jnp.sum(active) > 0.0)

    carry0 = (jnp.int32(0), gi_ref[:], gio_ref[:], za_ref[:], zao_ref[:],
              mask_ref[:])
    _, gi, gio, za, zao, _ = jax.lax.while_loop(cond, body, carry0)

    gi_out[:] = gi
    gio_out[:] = gio
    za_out[:] = za
    zao_out[:] = zao
    # stats with phi/xi from the *_old parameters (CTPF.jl:259-277)
    qp, qt, qb = factors(gio, zao)
    s_phi = jnp.sum(ealef * qp[:, None, :], axis=-1) + eps
    wa_out[:] = ealef * (qp[:, None, :] * (counts / s_phi)[:, :, None])
    s_xi = jnp.sum(ehe * (qt + qb)[:, None, :], axis=-1) + eps
    wh_out[:] = ehe * ((qt + qb)[:, None, :] * (ratings / s_xi)[:, :, None])


def ctpf_estep(ealef_d, ehe_d, counts, ratings, doc_mask,
               inv_db, inv_dv, inv_hv, gimel, gimel_old, zayin, zayin_old,
               *, viter: int, vtol: float, n_topics: int,
               c_hyper: float, g_hyper: float, interpret: bool = False):
    """Run the fused CTPF E-step over a chunk (see module docstring)."""
    B, L, Kp = ealef_d.shape
    R = ehe_d.shape[1]
    assert Kp % 128 == 0, Kp
    bt_cap = max(8, _MAX_TILE_ELEMS // ((L + R) * Kp))
    bt = 8
    while bt * 2 <= min(bt_cap, 256) and B % (bt * 2) == 0:
        bt *= 2
    assert B % bt == 0 and bt % 8 == 0, (B, bt)
    grid = (B // bt,)

    kern = functools.partial(_estep_kernel, viter=viter, vtol=vtol,
                             n_topics=n_topics, c_hyper=c_hyper,
                             g_hyper=g_hyper)
    f32 = ealef_d.dtype
    out_shapes = (
        jax.ShapeDtypeStruct((B, Kp), f32),
        jax.ShapeDtypeStruct((B, Kp), f32),
        jax.ShapeDtypeStruct((B, Kp), f32),
        jax.ShapeDtypeStruct((B, Kp), f32),
        jax.ShapeDtypeStruct((B, L, Kp), f32),   # w_alef
        jax.ShapeDtypeStruct((B, R, Kp), f32),   # w_he
    )
    vec = lambda shp: pl.BlockSpec(shp, lambda i: (i,) + (0,) * (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    kvec = pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        vec((bt, L, Kp)), vec((bt, R, Kp)), vec((bt, L)), vec((bt, R)),
        vec((bt, 1)), kvec, kvec, kvec,
        vec((bt, Kp)), vec((bt, Kp)), vec((bt, Kp)), vec((bt, Kp)),
    ]
    out_specs = (vec((bt, Kp)), vec((bt, Kp)), vec((bt, Kp)), vec((bt, Kp)),
                 vec((bt, L, Kp)), vec((bt, R, Kp)))
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(ealef_d, ehe_d, counts, ratings, doc_mask[:, None],
      inv_db[None, :], inv_dv[None, :], inv_hv[None, :],
      gimel, gimel_old, zayin, zayin_old)
