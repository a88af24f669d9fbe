"""Fused Pallas kernel for the LDA ELBO's token-level terms.

The XLA ELBO pass (models/lda.py:make_elbo) is HBM-bound: it gathers
two [B, L, K] tables (beta_old and beta for Elogpw) and materialises
phi plus a couple of elementwise products between them — ~5 tile-sized
round-trips per chunk, measured 93 ms at NSF K=100 (about half a
training step, paid at every ``checkelbo`` sync; the reference's
default cadence is every iteration, modelutils.jl:574-585).

This kernel holds both gathered tiles VMEM-resident and reduces every
token-level ELBO term in one pass; nothing tile-sized is ever written
back.  The algebra (LDA.jl:56-80, using Σ_k phi = 1 and
phi_lk = bo_lk·e_k / s_l with s_l = Σ_k bo_lk·e_k):

    Elogpz  = Σ_k (e ⊙ q)_k·El_k              q_k = Σ_l (c/s)_l·bo_lk
    Elogpw  = Σ_k e_k·Σ_l (c/s)_l·bo_lk·log bc_lk
    −Elogqz = −Σ_k e_k·Σ_l (c/s)_l·bo_lk·log bo_lk
              − Σ_k (e ⊙ q)_k·Elo_k + Σ_l c_l·log s_l

Doc-level terms (Elogptheta, the Dirichlet entropy) stay in XLA —
they are [B, K]-sized and cheap.

log is computed in-kernel by a bitcast-based Cephes construction
(``alog_bits``): Mosaic lowers neither ``frexp`` nor ``lgamma``, and
the VPU's native log is hundreds of ULPs off — the very noise the
accurate ELBO path exists to remove (utils/numerics.py).  exp stays
the VPU op: phi-level error perturbs the bound only through ratios
(first-order cancellation), which measurement of the XLA path confirms
is negligible next to the log terms.

Citations: reference update_elbo! LDA.jl:50-93; the E-step twin of
this kernel is kernels/lda_estep.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# two [bt, L, Kp] tiles resident (beta_old_d, beta_cur_d) plus
# temporaries — half the E-step kernel's single-tile cap
_MAX_TILE_ELEMS = 16 * 128 * 128
_VMEM_BUDGET_BYTES = 12_500_000

_SQRT2 = 1.4142135623730951
_LN2_C1 = 0.693359375          # ln2 split, low mantissa bits zero
_LN2_C2 = -2.12194440e-4


def fits_vmem(l_elems: int, Kp: int) -> bool:
    """True when an 8-doc two-tile working set fits VMEM."""
    return 8 * l_elems * Kp * 4 * 8 <= _VMEM_BUDGET_BYTES


def alog_bits(x: jax.Array) -> jax.Array:
    """~2-ULP f32 log for positive normal x, via exponent/mantissa
    bit-extraction (no frexp — Mosaic-lowerable).  Same atanh-series
    construction as numerics._alog_f32."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & 0x7FFFFF) | (127 << 23), jnp.float32)   # m ∈ [1, 2)
    big = m > _SQRT2
    m = jnp.where(big, m * 0.5, m)                      # m ∈ [√½, √2)
    ef = (e + big.astype(jnp.int32)).astype(x.dtype)
    r = (m - 1.0) / (m + 1.0)
    r2 = r * r
    p = 1 / 3 + r2 * (1 / 5 + r2 * (1 / 7 + r2 * (1 / 9 + r2 * (1 / 11))))
    logm = 2.0 * r + (2.0 * r) * (r2 * p)
    return (logm + ef * _LN2_C2) + ef * _LN2_C1


def _elbo_kernel(tab_ref, counts_ref, mask_ref,
                 el_ref, elo_ref, out_ref, *, Kp: int):
    """Token-level ELBO partial sum for one tile of documents."""
    tab = tab_ref[:]                    # [bt, L, 2Kp] gathered combined table
    bo = tab[:, :, :Kp]                 # (beta_old+eps)[:,terms]; 0 pad topics
    g2 = tab[:, :, Kp:]                 # bo·(log bc − log bo); 0 pad topics
    c = counts_ref[:]                   # [bt, L] 0 on padded slots
    dm = mask_ref[:]                    # [bt, 1]
    el = el_ref[:]                      # [bt, Kp] current Elogtheta, 0 pad
    elo = elo_ref[:]                    # [bt, Kp] old Elogtheta, 0 pad

    e = jnp.exp(elo)                                     # [bt, Kp]
    s = jnp.sum(bo * e[:, None, :], axis=-1)             # [bt, L]
    # LDA folds +eps into bo so s > 0 everywhere, but CTM feeds raw
    # beta_old (CTM.jl:93): a padded slot gathering an unused vocab row
    # gives s = 0 and c/s = 0/0 = NaN without the mask.  The unselected
    # lane divides by a safe 1.0 so no 0/0 is ever computed (it would
    # poison gradients if this kernel were differentiated); a REAL token
    # (c > 0) over an all-zero beta_old column still yields inf — genuine
    # degeneracy is surfaced, not masked.
    s_safe = jnp.where(c > 0, s, 1.0)
    r = jnp.where(c > 0, c / s_safe, 0.0)                # [bt, L] 0 on padding
    q = jnp.sum(r[:, :, None] * bo, axis=1)              # [bt, Kp]
    a2 = jnp.sum(r[:, :, None] * g2, axis=1)             # [bt, Kp]
    eq = e * q                                           # Σ_l c·phi  [bt, Kp]
    # keep everything >= 2-D ([bt, 1]) — Mosaic relayouts of 1-D vectors
    # are incompletely supported ("Offset change")
    kd = dict(axis=-1, keepdims=True)
    per_doc = (
        jnp.sum(eq * (el - elo), **kd)                   # Elogpz − qz part 2
        + jnp.sum(e * a2, **kd)                          # Elogpw − qz part 1
        + jnp.sum(c * alog_bits(s), **kd)                # −Elogqz part 3
    )                                                    # [bt, 1]
    total = jnp.sum(per_doc * dm)
    # TPU block tiling wants a full [8, 128] f32 tile — the scalar rides
    # in element (0, 0), the rest are zeros (summed harmlessly by the
    # caller)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    out_ref[:, :, :] = jnp.where((sub == 0) & (lane == 0), total, 0.0)


def lda_elbo_tok(tab_d, counts, doc_mask, El, El_old,
                 interpret: bool = False) -> jax.Array:
    """Token-level ELBO terms summed over a chunk of documents.

    Args (Kp = topic axis rounded up to 128, padded lanes zero):
      tab_d: [B, L, 2Kp] ONE gather of the combined per-term table
             ``[beta_old+eps | (beta_old+eps)·(log(beta+eps) −
             log(beta_old+eps))]`` — the Σ_k phi = 1 algebra folds
             Elogpw and the −Σ phi·log bo entropy part into a single
             pre-logged lane group, so the gather (the pass's per-row
             cost) happens once at double width instead of twice
      counts: [B, L]; doc_mask: [B]
      El, El_old: [B, Kp] current/old Elogtheta
    Returns the scalar Σ_docs (Elogpz + Elogpw − Elogqz).
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
        functools.partial(_elbo_kernel, Kp=Kp),
        grid=grid,
        in_specs=[vec((bt, L, K2)), vec((bt, L)),
                  vec((bt, 1)), vec((bt, Kp)), vec((bt, Kp))],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B // bt, 8, 128), tab_d.dtype),
        interpret=interpret,
    )(tab_d, counts, doc_mask[:, None], El, El_old)
    return jnp.sum(out)
