"""Fused CTM E-step Pallas kernel.

TPU-native replacement for the gpuCTM kernel set (``CTM_LAMBDA_c`` with
its in-kernel workgroup Gauss–Jordan, ``CTM_VSQ_c``, ``CTM_LOGZETA_c``,
``CTM_PHI(_NORM)_c``; gpuCTM.jl:258-473): a tile of documents runs its
ENTIRE viter fixpoint — phi normaliser, logzeta logsumexp, the
per-coordinate vsq Newton, the phi@counts reduction, and the lambda
Newton whose K×K SPD solve is the matrix-free Jacobi-preconditioned CG
of ops/newton.py (matvec = one [bt,Kp]@[Kp,Kp] MXU dot) — inside one
kernel, with the gathered ``log beta[:, terms]`` tile VMEM-resident
throughout.

SUNSET (2026-08, round 4): this file is retained ONLY as the runnable
record of the measured negative result below (ROADMAP.md preserves the
numbers).  It is not a production path, gets no new features, and will
be deleted (analysis kept in ROADMAP.md) the first time it blocks a
refactor of models/ctm.py or ops/newton.py.

MEASURED NEGATIVE RESULT (kept as documentation + the `use_pallas=True`
experimental path): at NSF K=50 this kernel runs 3.1 s/iter vs the XLA
body's 0.57 — 5.5× SLOWER.  The hypothesis (in-jit while-loop
iterations are dispatch-bound) was wrong: XLA's Newton/CG while loops
batch over the full 2048-doc chunk, amortising per-iteration overhead
over [2048, K] tensors and exiting early, while this kernel's loops run
per TILE (bt≈16, bounded by the [bt, L, Kp] VMEM token tile) over a
SEQUENTIAL grid — n_tiles × loop-iters of tiny [bt, 128] vector work,
latency-bound.  The in-kernel fixpoint pays for LDA because its
per-iteration work is the big [bt, L, Kp] token tile; CTM's inner
iterations only touch [bt, K].  models/ctm.py therefore defaults
use_pallas to OFF.

Padding conventions (Kp = K rounded to 128):
* lb (log beta gathered, zero-count slots pre-masked to 0 like
  models/ctm.py) carries −1e30 on pad-topic lanes so softmaxes ignore
  them; mu/pc pad 0; vsq state pad 1 (keeps 1/vsq² finite); lam pad 0;
* invsigma is embedded in a [Kp, Kp] identity (pad diagonal 1, pad
  off-diagonals 0) so ``x @ invsigma`` is exact on real lanes and the
  pad lanes of every gradient stay 0;
* pad lanes start inactive in the vsq Newton and contribute nothing to
  any reduction (kmask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pure-jnp helpers, fully traceable inside the kernel
from ..ops.newton import _backtrack_rho
from ..utils.numerics import EPSILON

_MAX_TILE_ELEMS = 16 * 128 * 128
_NEG = -1e30




def _estep_kernel(lb_ref, counts_ref, mask_ref, mu_ref, inv_ref, isd_ref,
                  lam_ref, lamo_ref, vsq_ref, lz_ref,
                  lam_out, lamo_out, vsq_out, lz_out, w_out,
                  *, viter: int, vtol: float, niter: int, ntol: float,
                  n_topics: int):
    lb = lb_ref[:]                  # [bt, L, Kp]; −1e30 on pad lanes
    counts = counts_ref[:]          # [bt, L]
    mu = mu_ref[:]                  # [1, Kp] (pad 0)
    inv = inv_ref[:]                # [Kp, Kp] (pad block = identity)
    isd = isd_ref[:]                # [1, Kp] diag(invsigma) (pad 1)
    kp = mu.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
    kmask = (lane < n_topics).astype(lb.dtype)
    negpad = (1.0 - kmask) * _NEG
    C = jnp.sum(counts, axis=-1, keepdims=True)          # [bt, 1]
    vtol_f = jnp.float32(vtol)
    ntol_f = jnp.float32(ntol)
    cg_rtol = jnp.float32(1e-5)
    cg_maxiter = n_topics + 8

    def phi_parts(lam):
        # phi ∝ exp(lb + lam) over real lanes (CTM.jl:175-178)
        logits = lb + lam[:, None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1)
        return p, s

    def lse_k(x):
        # logsumexp over real topic lanes of [bt, Kp]
        xm = x * kmask + negpad
        m = jnp.max(xm, axis=-1, keepdims=True)
        return (m + jnp.log(jnp.sum(jnp.exp(xm - m), axis=-1,
                                    keepdims=True)))   # [bt, 1]

    def vsq_newton(lam, vsq, lz, active):
        """ops/newton.ctm_vsq_newton, tile-local.

        Loop masks ride as f32 (Mosaic cannot legalize i1 vectors in
        loop carries)."""
        act0 = active * kmask        # f32 mask [bt, Kp]

        def cond(c):
            i, _, act, _ = c
            return (i < niter) & (jnp.sum(act) > 0.0)

        def body(c):
            i, vsq, act, prev = c
            e = C * jnp.exp(lam + 0.5 * vsq - lz)
            grad = -0.5 * (isd + e - 1.0 / vsq)
            invhess = -1.0 / (0.25 * e + 0.5 / (vsq * vsq))
            p = invhess * grad
            rho = _backtrack_rho(vsq, p, strict=True)
            on = act > 0.0
            vsq2 = jnp.where(on, vsq - rho * p, vsq)
            sn = rho * jnp.abs(p)
            keep = (rho * jnp.abs(grad) >= ntol_f)                 & (sn > 1e-5 * (jnp.abs(vsq2) + 1e-12))                 & ~((i >= 8) & (sn >= prev))
            act2 = act * keep.astype(act.dtype)
            return i + 1, vsq2, act2, sn

        _, vsq, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), vsq, act0, jnp.full_like(vsq, jnp.inf)))
        return vsq + jnp.float32(EPSILON)  # @positive guard (CTM.jl:164)

    def cg_solve(expo, b, act):
        """ops/newton.spd_cg_solve with matvec = x@inv + expo·x.
        Masks ride as f32 (no i1 vectors in loop carries)."""
        inv_diag = 1.0 / (isd + expo)
        bnorm2 = jnp.sum(b * b, axis=-1, keepdims=True)
        tol2 = (cg_rtol * cg_rtol) * bnorm2
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = r0 * inv_diag
        p0 = z0
        rz0 = jnp.sum(r0 * z0, axis=-1, keepdims=True)
        act0 = act * (bnorm2 > 0).astype(act.dtype)

        def cond(c):
            i, _, _, _, _, a = c
            return (i < cg_maxiter) & (jnp.sum(a) > 0.0)

        def body(c):
            i, x, r, p, rz, a = c
            on = a > 0.0
            Ap = jnp.dot(p, inv, preferred_element_type=jnp.float32) \
                + expo * p
            pAp = jnp.sum(p * Ap, axis=-1, keepdims=True)
            alpha = jnp.where(on, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = r * inv_diag
            rz_new = jnp.sum(r * z, axis=-1, keepdims=True)
            beta = rz_new / jnp.where(rz > 0, rz, 1.0)
            p = jnp.where(on, z + beta * p, p)
            a = a * (jnp.sum(r * r, axis=-1, keepdims=True)
                     > tol2).astype(a.dtype)
            return i + 1, x, r, p, rz_new, a

        _, x, _, _, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x0, r0, p0, rz0, act0))
        return x

    def lambda_newton(lam, vsq, lz, pc, active):
        """ops/newton.ctm_lambda_newton, tile-local (f32 masks)."""
        act0 = active                # f32 [bt, 1]

        def cond(c):
            i, _, act, _ = c
            return (i < niter) & (jnp.sum(act) > 0.0)

        def body(c):
            i, lam, act, prev = c
            on = act > 0.0
            expo = C * jnp.exp(lam + 0.5 * vsq - lz) * kmask
            grad = jnp.dot(mu - lam, inv,
                           preferred_element_type=jnp.float32) + pc - expo
            step = cg_solve(expo, grad, act)
            lam2 = jnp.where(on, lam + step, lam)
            sn = jnp.sqrt(jnp.sum(step * step, axis=-1, keepdims=True))
            l2 = jnp.sqrt(jnp.sum(lam2 * lam2, axis=-1, keepdims=True))
            gn = jnp.sqrt(jnp.sum(grad * grad, axis=-1, keepdims=True))
            keep = (gn >= ntol_f) & (sn > 1e-5 * (l2 + 1.0))                 & ~((i >= 8) & (sn >= prev))
            act2 = act * keep.astype(act.dtype)
            return i + 1, lam2, act2, sn

        bt = lam.shape[0]
        _, lam, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), lam, act0, jnp.full((bt, 1), jnp.inf, lam.dtype)))
        return lam

    def body(it, carry):
        lam, lamo, vsq, lz, active = carry
        # update_phi! (CTM.jl:175-178) — parts reused for pc below
        p, s = phi_parts(lam)
        # update_logzeta! (CTM.jl:169-171)
        lz_new = lse_k(lam + 0.5 * vsq)
        upd = active > 0.0
        lz2 = jnp.where(upd, lz_new, lz)
        # update_vsq! (CTM.jl:146-165)
        vsq_new = vsq_newton(lam, vsq, lz2, active)
        vsq2 = jnp.where(upd, vsq_new, vsq)
        # phi @ counts with the pre-update lambda's phi (models/ctm.py)
        pc = jnp.sum(p * (counts / s)[:, :, None], axis=1) * kmask
        # update_lambda! (CTM.jl:129-142)
        lam_new = lambda_newton(lam, vsq2, lz2, pc, active)
        lamo2 = jnp.where(upd, lam, lamo)
        lam2 = jnp.where(upd, lam_new, lam)
        # break: ‖lambda − lambda_old‖ < vtol (CTM.jl:200)
        d = lam2 - lamo2
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
        active2 = jnp.where(dist >= vtol_f, active, 0.0)
        return lam2, lamo2, vsq2, lz2, active2

    # outer fixpoint as fori (converged docs are masked no-ops); Mosaic
    # cannot legalize while-in-while nesting, so the data-dependent
    # early exits live in the INNER Newton loops only
    carry0 = (lam_ref[:], lamo_ref[:], vsq_ref[:], lz_ref[:], mask_ref[:])
    lam, lamo, vsq, lz, _ = jax.lax.fori_loop(0, viter, body, carry0)

    lam_out[:] = lam
    lamo_out[:] = lamo
    vsq_out[:] = vsq
    lz_out[:] = lz
    # M-step stat with phi = f(beta, lambda_old) (CTM.jl:93, 122-125)
    p, s = phi_parts(lamo)
    w_out[:] = p * (counts / s)[:, :, None]


def ctm_estep(lb, counts, doc_mask, mu, invsigma_p, isd,
              lam, lam_old, vsq, logzeta,
              *, viter: int, vtol: float, niter: int, ntol: float,
              n_topics: int, interpret: bool = False):
    """Run the fused CTM E-step over a chunk (see module docstring).

    lb: [B, L, Kp] gathered log beta (zero-count slots pre-masked to 0,
    pad-topic lanes −1e30); mu/isd: [Kp] (pad 0 / pad 1); invsigma_p:
    [Kp, Kp] (identity on the pad block); lam/vsq: [B, Kp] (pad 0 / 1);
    logzeta: [B].  Returns (lam, lam_old, vsq, logzeta, w).
    """
    B, L, Kp = lb.shape
    assert Kp % 128 == 0, Kp
    bt_cap = max(8, _MAX_TILE_ELEMS // (L * Kp))
    bt = 8
    while bt * 2 <= min(bt_cap, 256) and B % (bt * 2) == 0:
        bt *= 2
    assert B % bt == 0 and bt % 8 == 0, (B, bt)
    grid = (B // bt,)

    kern = functools.partial(_estep_kernel, viter=viter, vtol=vtol,
                             niter=niter, ntol=ntol, n_topics=n_topics)
    f32 = lb.dtype
    out_shapes = (
        jax.ShapeDtypeStruct((B, Kp), f32),      # lam
        jax.ShapeDtypeStruct((B, Kp), f32),      # lam_old
        jax.ShapeDtypeStruct((B, Kp), f32),      # vsq
        jax.ShapeDtypeStruct((B, 1), f32),       # logzeta
        jax.ShapeDtypeStruct((B, L, Kp), f32),   # w = phi·counts
    )
    vec = lambda shp: pl.BlockSpec(shp, lambda i: (i,) + (0,) * (len(shp) - 1),
                                   memory_space=pltpu.VMEM)
    in_specs = [
        vec((bt, L, Kp)), vec((bt, L)), vec((bt, 1)),
        pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        vec((bt, Kp)), vec((bt, Kp)), vec((bt, Kp)), vec((bt, 1)),
    ]
    out_specs = (vec((bt, Kp)), vec((bt, Kp)), vec((bt, Kp)), vec((bt, 1)),
                 vec((bt, L, Kp)))
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(lb, counts, doc_mask[:, None], mu[None, :], invsigma_p, isd[None, :],
      lam, lam_old, vsq, logzeta[:, None])
