"""Fused Pallas kernel for the fLDA ELBO's token-level terms.

**Measured result: parity, not a win — defaulted OFF.**  On chip at NSF
K=100 the kernel ties the XLA pass (84.9 vs 85.0 ms, same-process
min-of-3).  Unlike LDA/CTM — whose multiplicative phi lets the kernel
pre-fold every log into the gathered table and skip the softmax — the
tau exponent forces a full [bt, L, Kp] exp in-kernel, so the pass is
transcendental-bound either way, and the combined [logβo|κ|logβc]
gather (which IS a win) already serves the XLA path.  Kept as a tested
experimental path (``use_pallas=True``) per the repo's negative-result
convention (see kernels/ctm_estep.py).

SUNSET (2026-08, round 4): retained only as the runnable record of the
parity measurement (numbers preserved in ROADMAP.md/RESULTS.md); not a
production path, no new features, deleted on first conflict with a
models/flda.py refactor.

fLDA's ELBO phi is softmax(tau·log β_old + Elogtheta_old) — the
per-token tau exponent (fLDA.jl:113, 204-207) means the LDA ELBO
kernel's pre-folded multiplicative form doesn't apply: the softmax must
be evaluated per token in-kernel.  Everything else follows the same
recipe as kernels/lda_elbo.py:

* ONE combined gather ``[log β_old (+ log κ in pad lane K) | log β]``
  of width 2Kp — three per-token tables at one per-row gather cost
  (log κ rides pad lane K exactly like the E-step kernel's kappa trick,
  kernels/flda_estep.py; Elogtheta pads are pinned to −1e30 so pad
  lanes never reach phi).
* All token terms reduced over the VMEM-resident tile; the entropy
  uses the exact identity H = logsumexp(logits) − Σ p·logits, which in
  XLA *measured slower* (it broke the softmax producer-consumer fusion
  and forced an extra [B,L,K] HBM round-trip — ROADMAP) but is a pure
  win in-register.
* log Z via the bitcast ~2-ULP ``alog_bits``; the softmax's exp stays
  the VPU op (phi-level error cancels to first order in the bound).

The reference recomputes phi from tau_old (fLDA.jl:113) but weights
Elogpw with the CURRENT tau (fLDA.jl:82-86), matching models/flda.py's
XLA path — so the kernel takes BOTH tau (weights) and tau_old (the phi
exponent).  Token terms (fLDA.jl:74-105), current El / old Elo:

    Elogpz  = Σ_k (Σ_l c·p)_k · El_k
    Elogpw  = Σ_l (c·tau)_l·(Σ_k p·logβ)_l + Σ_l c(1−tau)_l·logκ_l
    −Elogqz = Σ_l c_l·(lse_l − tau_old_l·(Σ_k p·logβo)_l − (Σ_k p·Elo)_l)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lda_elbo import _MAX_TILE_ELEMS, _VMEM_BUDGET_BYTES, alog_bits


def fits_vmem(l_elems: int, Kp: int) -> bool:
    """True when an 8-doc two-lane-group working set fits VMEM."""
    return 8 * l_elems * Kp * 4 * 8 <= _VMEM_BUDGET_BYTES


def flda_elbo_tok(tab_d, counts, tau, tau_old, doc_mask, El, El_old,
                  kappa_lane: int, interpret: bool = False) -> jax.Array:
    """Token-level fLDA ELBO terms over a chunk (see module docstring).

    ``tab_d``: [B, L, 2Kp] gathered combined table; ``kappa_lane`` is
    the pad lane of the first group holding log κ (requires K < Kp).
    Returns Σ_docs (Elogpz + Elogpw − Elogqz).
    """
    B, L, K2 = tab_d.shape
    Kp = K2 // 2
    assert Kp % 128 == 0, Kp
    bt_cap = max(8, _MAX_TILE_ELEMS // (L * Kp))
    bt = 8
    while bt * 2 <= min(bt_cap, 256) and B % (bt * 2) == 0:
        bt *= 2
    assert B % bt == 0 and bt % 8 == 0, (B, bt)
    grid = (B // bt,)

    vec = lambda shp: pl.BlockSpec(shp, lambda i: (i,) + (0,) * (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_with_kappa, Kp=Kp, kappa_lane=kappa_lane),
        grid=grid,
        in_specs=[vec((bt, L, K2)), vec((bt, L)), vec((bt, L)), vec((bt, L)),
                  vec((bt, 1)), vec((bt, Kp)), vec((bt, Kp))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // bt, 8, 128), tab_d.dtype),
        interpret=interpret,
    )(tab_d, counts, tau, tau_old, doc_mask[:, None], El, El_old)
    return jnp.sum(out)


def _kernel_with_kappa(tab_ref, counts_ref, tau_ref, tauo_ref, mask_ref,
                       el_ref, elo_ref, out_ref, *, Kp: int, kappa_lane: int):
    tab = tab_ref[:]                     # [bt, L, 2Kp]
    lb = tab[:, :, :Kp]                  # log(beta_old+eps); logκ in pad lane
    lb2 = tab[:, :, Kp:]                 # log(beta+eps); 0 pad lanes
    c = counts_ref[:]
    ta = tau_ref[:]
    tao = tauo_ref[:]
    dm = mask_ref[:]
    el = el_ref[:]
    elo = elo_ref[:]                     # −1e30 on pad lanes

    logits = tao[:, :, None] * lb + elo[:, None, :]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    z = jnp.sum(e, axis=-1, keepdims=True)
    p = e / z
    lse = mx[:, :, 0] + alog_bits(z[:, :, 0])

    pc = jnp.sum(c[:, :, None] * p, axis=1)              # [bt, Kp]
    plb = jnp.sum(p * lb, axis=-1)                       # [bt, L]
    peo = jnp.sum(p * jnp.maximum(elo[:, None, :], -1e29), axis=-1)
    klog = lb[:, :, kappa_lane]                          # [bt, L] log κ[terms]

    kd = dict(axis=-1, keepdims=True)
    # stay >= 2-D throughout: a 1-D intermediate (axis=(1,2) reduce)
    # crashes the Mosaic layout pass (layout_rank check)
    plb2 = jnp.sum(p * lb2, axis=-1)                     # [bt, L] Σ p·logβ
    per_doc = (
        jnp.sum(pc * el, **kd)                                       # Elogpz
        + jnp.sum((c * ta) * plb2, **kd)                             # β part
        + jnp.sum((c * (1.0 - ta)) * klog, **kd)                     # κ part
        + jnp.sum(c * (lse - tao * plb - peo), **kd)                 # −Elogqz
    )
    total = jnp.sum(per_doc * dm)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    out_ref[:, :, :] = jnp.where((sub == 0) & (lane == 0), total, 0.0)
