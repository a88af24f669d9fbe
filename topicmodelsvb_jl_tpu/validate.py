"""Model-state invariant validation (reference ``check_model``).

The reference runs a ~320-line per-model validator at the top of every
``train!`` (modelutils.jl:39-360) asserting shape, positivity,
finiteness and stochasticity of every variational parameter.  Here the
array predicates are evaluated **on device** as a single jitted program
of scalar reductions — only booleans cross the host boundary, so the
check stays cheap at any corpus scale (the reference fetches nothing
because its state already lives on the host).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


class _Checks:
    """Collects named deferred predicates (fn, array) so every reduction
    traces inside ONE jitted program — a single dispatch, only the
    stacked boolean vector crosses the host boundary."""

    def __init__(self):
        self.names = []
        self.fns = []
        self.args = []

    def add(self, name: str, fn, a) -> None:
        self.names.append(name)
        self.fns.append(fn)
        self.args.append(a)

    # ── predicate builders (reference modelutils.jl idioms) ──
    def finite(self, name, a):
        self.add(f"{name} must be finite",
                 lambda x: jnp.all(jnp.isfinite(x)), a)

    def positive(self, name, a):
        self.add(f"{name} must be positive",
                 lambda x: jnp.all(x > 0) & jnp.all(jnp.isfinite(x)), a)

    def nonnegative(self, name, a):
        self.add(f"{name} must be nonnegative",
                 lambda x: jnp.all(x >= 0) & jnp.all(jnp.isfinite(x)), a)

    def stochastic(self, name, a, axis, atol=1e-3):
        """Rows/cols sum to 1 (reference isstochastic, utils.jl:144-154)."""

        def ok(x):
            s = jnp.sum(x, axis=axis)
            return jnp.all(jnp.abs(s - 1.0) <= atol) & jnp.all(x >= 0)

        self.add(f"{name} must be a stochastic matrix", ok, a)

    def unit_interval(self, name, a):
        self.add(f"{name} must be in [0, 1]",
                 lambda x: jnp.all((x >= 0) & (x <= 1))
                 & jnp.all(jnp.isfinite(x)), a)


def _run(checks: _Checks) -> Dict[str, bool]:
    fns = tuple(checks.fns)
    flags = jax.jit(
        lambda args: jnp.stack([f(a) for f, a in zip(fns, args)])
    )(tuple(checks.args))
    return dict(zip(checks.names, np.asarray(flags).tolist()))


def state_violations(model) -> list:
    """Names of violated invariants for a model's current state."""
    from .api import CTM, CTPF, DTM, HMTM, LDA, fCTM, fLDA

    s = model.state
    c = _Checks()
    if isinstance(model, (LDA, fLDA)):          # modelutils.jl:39-67, 69-106
        c.positive("alpha", s.alpha)
        c.stochastic("beta", s.beta, axis=1)
        c.positive("gamma", s.gamma)
        c.finite("Elogtheta", s.Elogtheta)
        if isinstance(model, fLDA):
            c.unit_interval("eta", s.eta)
            c.stochastic("kappa", s.kappa, axis=0)
            c.unit_interval("tau", s.tau)
    elif isinstance(model, (CTM, fCTM)):        # modelutils.jl:108-178
        c.finite("mu", s.mu)
        c.finite("sigma", s.sigma)
        # the reference's own todo.txt:7 admits check_model never
        # requires sigma/invsigma finite; close that gap here
        c.finite("invsigma", s.invsigma)
        c.stochastic("beta", s.beta, axis=1)
        c.finite("lambda", s.lam)
        c.positive("vsq", s.vsq)
        c.finite("logzeta", s.logzeta)
        if isinstance(model, fCTM):
            c.unit_interval("eta", s.eta)
            c.stochastic("kappa", s.kappa, axis=0)
            c.unit_interval("tau", s.tau)
    elif isinstance(model, HMTM):               # completed HMTM stub
        c.positive("eta", s.eta)
        c.positive("alpha", s.alpha)
        c.stochastic("beta", s.beta, axis=1)
        c.positive("tau", s.tau)
        c.positive("gamma", s.gamma)
    elif isinstance(model, DTM):                # v0.6 fixmodel! analogue
        c.positive("alpha", s.alpha)
        c.finite("betahat", s.betahat)
        c.finite("mbeta", s.mbeta)
        c.positive("vbeta", s.vbeta)
        c.positive("gamma", s.gamma)
        c.finite("lzeta", s.lzeta)
    elif isinstance(model, CTPF):               # modelutils.jl:181-253
        for name in ("alef", "bet", "gimel", "dalet", "he", "vav",
                     "zayin", "het"):
            c.positive(name, getattr(s, name))
    else:
        raise TypeError(type(model))

    flags = _run(c)
    bad = [name for name, ok in flags.items() if not ok]

    # sigma posdef (modelutils.jl:116-118) — [K, K] is tiny, host Cholesky
    if isinstance(model, (CTM, fCTM)) and not bad:
        try:
            np.linalg.cholesky(np.asarray(s.sigma, dtype=np.float64))
        except np.linalg.LinAlgError:
            bad.append("sigma must be positive definite")
    return bad


def check_model(model) -> None:
    """Raise TopicModelError on any violated state invariant
    (reference check_model, modelutils.jl:39-360)."""
    from .api import TopicModelError

    bad = state_violations(model)
    if bad:
        raise TopicModelError("; ".join(bad) + ".")
