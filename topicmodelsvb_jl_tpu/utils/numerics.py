"""Numeric utilities and constants.

TPU-native re-implementation of the reference's numeric layer
(TopicModelsVB.jl ``src/utils.jl``):

* ``EPSILON`` underflow guard (utils.jl:3) — ``eps(1e-14) ≈ 1.6e-30``.
* ``finite`` overflow clamp (utils.jl:107).
* ``additive_logistic`` overflow-safe softmax (utils.jl:114-139).
* ``logsumexp`` (utils.jl:110).
* Dirichlet entropy closed form (utils.jl:163-180).
* digamma/trigamma — the reference hand-rolls an OpenCL digamma
  (utils.jl:21-53); on TPU these are XLA intrinsics
  (``jax.lax.digamma`` / ``jax.lax.polygamma``), fused into the
  surrounding elementwise graph by the compiler.

Everything here is jit-safe and dtype-polymorphic (f32 on TPU,
f64 for the CPU oracle, mirroring the reference's CPU-f64/GPU-f32
split, LDA.jl:14-21 vs gpuLDA.jl:14-21).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Underflow guard: Julia eps(1e-14) (reference utils.jl:3).  Still a normal
# float32 (> 1.18e-38), matching the reference's EPSILON32 = 1e-30 (utils.jl:6).
EPSILON = float(np.spacing(1e-14))  # 1.6033346880071782e-30

# Euler–Mascheroni constant (reference utils.jl:10).
EULERGAMMA = 0.5772156649015329


def finite(x: jax.Array) -> jax.Array:
    """Clamp ±Inf overflow to ±floatmax (reference utils.jl:107)."""
    fmax = jnp.finfo(x.dtype).max
    return jnp.sign(x) * jnp.minimum(jnp.abs(x), fmax)


def boink(x: jax.Array) -> jax.Array:
    """``x .+ EPSILON`` — the reference's @boink guard (macros.jl:28-31)."""
    return x + jnp.asarray(EPSILON, dtype=x.dtype)


def additive_logistic(x: jax.Array, axis: int | None = None) -> jax.Array:
    """Overflow-safe softmax (reference utils.jl:114-139).

    With ``axis=None`` the max/sum run over the whole array (the
    vector/matrix forms at utils.jl:125-139); otherwise over ``axis``
    (the ``dims`` form at utils.jl:114-121).
    """
    m = jnp.max(x, axis=axis, keepdims=axis is not None)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axis, keepdims=axis is not None)


def logsumexp(x: jax.Array, axis: int | None = None) -> jax.Array:
    """Overflow-safe log-sum-exp (reference utils.jl:110)."""
    m = jnp.max(x, axis=axis, keepdims=axis is not None)
    out = jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=axis is not None)) + m
    return out if axis is None else jnp.squeeze(out, axis=axis)


def digamma(x: jax.Array) -> jax.Array:
    return jax.lax.digamma(x)


def trigamma(x: jax.Array) -> jax.Array:
    return jax.lax.polygamma(jnp.ones((), dtype=jnp.result_type(x)), x)


def lgamma(x: jax.Array) -> jax.Array:
    return jax.lax.lgamma(x)


def dirichlet_entropy(alpha: jax.Array, axis: int = -1) -> jax.Array:
    """Entropy of Dirichlet(alpha), patched closed form (utils.jl:163-180).

    en = lmnB + (α0 − k)·ψ(α0) − Σⱼ (αⱼ − 1)·ψ(αⱼ),
    lmnB = Σⱼ lnΓ(αⱼ) − lnΓ(α0).
    """
    a0 = jnp.sum(alpha, axis=axis)
    k = alpha.shape[axis]
    lmnb = jnp.sum(lgamma(alpha), axis=axis) - lgamma(a0)
    en = lmnb + (a0 - k) * digamma(a0) - jnp.sum((alpha - 1.0) * digamma(alpha), axis=axis)
    return en


def categorical_entropy(p: jax.Array, axis: int = -1) -> jax.Array:
    """−Σ p log p with 0·log 0 = 0 (reference Elogqz terms, LDA.jl:76-80)."""
    return -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0)), 0.0), axis=axis)


def bernoulli_entropy(t: jax.Array) -> jax.Array:
    """Entropy of Bernoulli(t) with 0·log0 = 0 (fLDA Elogqc, fLDA.jl:95-98)."""
    def xlogx(v):
        return jnp.where(v > 0, v * jnp.log(jnp.where(v > 0, v, 1.0)), 0.0)

    return -(xlogx(t) + xlogx(1.0 - t))


def gamma_entropy(shape: jax.Array, rate: jax.Array) -> jax.Array:
    """Entropy of Gamma(shape, scale=1/rate) (CTPF Elogq* terms, CTPF.jl:198-231).

    H = shape − log(rate) + lnΓ(shape) + (1 − shape)·ψ(shape).
    """
    return shape - jnp.log(rate) + lgamma(shape) + (1.0 - shape) * digamma(shape)


def mvnormal_diag_entropy(vsq: jax.Array, axis: int = -1) -> jax.Array:
    """Entropy of N(·, diag(vsq)) (CTM Elogqeta, CTM.jl:76-79).

    H = K/2·(1 + log 2π) + ½·Σ log vsq.
    """
    k = vsq.shape[axis]
    return 0.5 * k * (1.0 + jnp.log(2.0 * jnp.pi)) + 0.5 * jnp.sum(jnp.log(vsq), axis=axis)


def l2norm(x: jax.Array, axis: int = -1) -> jax.Array:
    return jnp.sqrt(jnp.sum(x * x, axis=axis))


def masked_fixpoint(body, carry: tuple, viter: int) -> tuple:
    """Early-exiting twin of ``lax.fori_loop(0, viter, body, carry)`` for
    per-lane-masked fixpoints whose carry ENDS with an ``active`` bool mask.

    Every model's E-step runs the reference's per-document viter loop
    batch-synchronously, freezing converged lanes with ``jnp.where`` on
    the mask (the break at e.g. LDA.jl:175, CTM.jl:200, CTPF.jl:359).
    Once every lane's flag clears, further passes are pure no-ops that
    still pay full price (gathers, Newtons, token scans) — so this runs
    the same body under a ``while_loop`` that also stops when
    ``~any(active)``.  Exactly trajectory-neutral by the freezing
    invariant; measured −33% s/iter on HMTM at NSF scale (RESULTS.md).

    Not reverse-differentiable (while_loop) — fine here: E-step outputs
    enter later gradients only as constants (see models/dtm.py's CG).
    """
    def cond(c):
        i, inner = c
        return (i < viter) & jnp.any(inner[-1])

    def step(c):
        i, inner = c
        return i + 1, body(i, inner)

    _, carry = jax.lax.while_loop(
        cond, step, (jnp.asarray(0, jnp.int32), carry))
    return carry


def is_stochastic(p: np.ndarray, axis: int, atol: float = 1e-6) -> bool:
    """Host-side stochastic-matrix predicate (reference utils.jl:144-154)."""
    p = np.asarray(p)
    return bool(np.all(p >= 0) and np.allclose(p.sum(axis=axis), 1.0, atol=atol))
