"""On-device Newton solvers.

* :func:`dirichlet_newton` — the Dirichlet hyperparameter update shared
  by LDA/fLDA: interior-point Newton with log-barrier and back-tracking
  line search (reference LDA.jl:97-118, fLDA.jl:128-149).  The reference
  GPU path runs this on host with a D→H→D round trip every outer
  iteration (gpuLDA.jl:132-154); here it is a replicated on-device
  ``lax.while_loop`` fed by the psum'd Elogtheta_sum, so nothing leaves
  the device.
* :func:`ctm_lambda_newton` — CTM per-document Newton with a K×K SPD
  solve (reference CTM.jl:129-142), batched over documents with a
  Cholesky solve instead of the reference's in-kernel workgroup
  Gauss–Jordan (``LINSOLVE_c``, utils.jl:60-90; the reference's own
  comment notes pivoting is unnecessary for SPD).
* :func:`ctm_vsq_newton` — per-coordinate Newton with back-tracking
  (reference CTM.jl:146-165), vectorised over [B, K].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.numerics import EPSILON, digamma, finite, l2norm, trigamma


def _backtrack_rho(x: jax.Array, p: jax.Array, strict: bool) -> jax.Array:
    """Largest ρ = 2^-m with x − ρ·p > 0 (strict) or ≥ 0, elementwise-min'd.

    Mirrors the reference's ``while minimum(x - rho*p) < 0: rho *= 0.5``
    (LDA.jl:107-109) / ``while x - rho*p <= 0`` (CTM.jl:154-156) as a
    scalar-per-lane while_loop.
    """
    def cond(rho):
        step = x - rho * p
        bad = (step <= 0) if strict else (step < 0)
        return jnp.any(bad & (rho > 1e-38))

    def body(rho):
        step = x - rho * p
        bad = (step <= 0) if strict else (step < 0)
        return jnp.where(bad, rho * 0.5, rho)

    return jax.lax.while_loop(cond, body, jnp.ones_like(x))


def dirichlet_newton(
    alpha: jax.Array,
    Elogtheta_sum: jax.Array,
    M: jax.Array,
    niter: int,
    ntol: float,
) -> jax.Array:
    """Interior-point Newton for the Dirichlet parameter (LDA.jl:97-118)."""
    K = alpha.shape[0]
    dtype = alpha.dtype
    M = jnp.asarray(M, dtype)
    nu0 = jnp.asarray(float(K), dtype)

    def cond(carry):
        i, _, _, done = carry
        return (i < niter) & (~done)

    def body(carry):
        i, alpha, nu, _ = carry
        a0 = jnp.sum(alpha)
        grad = nu / alpha + M * (digamma(a0) - digamma(alpha)) + Elogtheta_sum
        h_inv = -1.0 / (M * trigamma(alpha) + nu / alpha**2)
        denom = 1.0 / (M * trigamma(a0)) + jnp.sum(h_inv)
        p = (grad - jnp.dot(grad, h_inv) / denom) * h_inv

        # back-tracking: minimum(alpha - rho*p) must stay >= 0 (LDA.jl:107-109).
        # The reference halves rho from 1; the final value is the largest
        # 2^-m with rho <= min_k alpha_k/p_k over descending coordinates —
        # computed here in closed form instead of an inner while_loop.
        ratio = jnp.where(p > 0, alpha / jnp.where(p > 0, p, 1.0), jnp.inf)
        r_star = jnp.min(ratio)
        m = jnp.maximum(jnp.ceil(-jnp.log2(jnp.minimum(r_star, 1.0))), 0.0)
        rho = jnp.exp2(-m)

        alpha_new = finite(alpha - rho * p)
        # reference stopping rule (LDA.jl:113-115) — plus a numerical-
        # stagnation stop: once the accepted step is below f32 resolution
        # of alpha, further iterations cannot make progress (the
        # reference runs f64 on CPU where ntol is reachable; at f32 the
        # M-scaled gradient's noise floor can exceed ntol).
        stagnant = rho * l2norm(p) <= 1e-6 * (l2norm(alpha) + 1.0)
        done = ((rho * l2norm(grad) < ntol) & (nu / K < ntol)) | stagnant
        return i + 1, alpha_new, nu * 0.5, done

    _, alpha, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), alpha, nu0, jnp.asarray(False))
    )
    # @positive model.alpha (LDA.jl:117)
    return alpha + jnp.asarray(EPSILON, dtype)


def ctm_lambda_newton(
    lam: jax.Array,        # [B, K]
    vsq: jax.Array,        # [B, K]
    logzeta: jax.Array,    # [B]
    phi_counts: jax.Array, # [B, K]  = phi @ counts
    C: jax.Array,          # [B]    total token count per doc
    mu: jax.Array,         # [K]
    invsigma: jax.Array,   # [K, K]
    active: jax.Array,     # [B] bool — docs still in their viter loop
    niter: int,
    ntol: float,
) -> jax.Array:
    """Batched CTM lambda Newton (CTM.jl:129-142).

    Per iteration: grad = Σ⁻¹(μ−λ) + φc − C·exp(λ + v²/2 − logζ);
    −H = Σ⁻¹ + C·diag(exp(·)); λ += (−H)⁻¹ grad, via Cholesky
    (SPD: Σ⁻¹ posdef + positive diagonal).  Stops per doc when
    ‖grad‖ < ntol (masked, batch-synchronous).
    """
    dtype = lam.dtype

    def cond(carry):
        i, _, act = carry
        return (i < niter) & jnp.any(act)

    def body(carry):
        i, lam, act = carry
        expo = jnp.exp(lam + 0.5 * vsq - logzeta[:, None]) * C[:, None]  # [B, K]
        grad = (mu - lam) @ invsigma + phi_counts - expo
        # neg hessian: invsigma + diag(expo), batched Cholesky solve
        neg_hess = invsigma[None, :, :] + jax.vmap(jnp.diag)(expo)
        chol = jax.lax.linalg.cholesky(neg_hess)
        step = jax.lax.linalg.triangular_solve(
            chol, grad[:, :, None], left_side=True, lower=True
        )
        step = jax.lax.linalg.triangular_solve(
            chol, step, left_side=True, lower=True, transpose_a=True
        )[:, :, 0]
        lam_new = jnp.where(act[:, None], lam + step, lam)
        act_new = act & (l2norm(grad) >= ntol)
        return i + 1, lam_new, act_new

    _, lam, _ = jax.lax.while_loop(cond, body, (jnp.asarray(0), lam, active))
    return lam.astype(dtype)


def ctm_vsq_newton(
    lam: jax.Array,       # [B, K]
    vsq: jax.Array,       # [B, K]
    logzeta: jax.Array,   # [B]
    C: jax.Array,         # [B]
    invsigma_diag: jax.Array,  # [K]
    active: jax.Array,    # [B] bool
    niter: int,
    ntol: float,
) -> jax.Array:
    """Batched per-coordinate CTM vsq Newton with back-tracking (CTM.jl:146-165)."""
    def cond(carry):
        i, _, act = carry
        return (i < niter) & jnp.any(act)

    def body(carry):
        i, vsq, act = carry
        e = C[:, None] * jnp.exp(lam + 0.5 * vsq - logzeta[:, None])
        grad = -0.5 * (invsigma_diag[None, :] + e - 1.0 / vsq)
        invhess = -1.0 / (0.25 * e + 0.5 / vsq**2)
        p = invhess * grad
        rho = _backtrack_rho(vsq, p, strict=True)
        vsq_new = jnp.where(act, vsq - rho * p, vsq)
        act_new = act & (rho * jnp.abs(grad) >= ntol)
        return i + 1, vsq_new, act_new

    act0 = active[:, None] & jnp.ones_like(vsq, dtype=bool)
    _, vsq, _ = jax.lax.while_loop(cond, body, (jnp.asarray(0), vsq, act0))
    # @positive model.vsq[d] (CTM.jl:164)
    return vsq + jnp.asarray(EPSILON, vsq.dtype)
