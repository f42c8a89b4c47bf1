"""
Dirichlet proposal over switch-interval fractions ``s``.

Reference parity: ``bild/amis.py:59-151``. JAX-native: sampling uses explicit
PRNG keys; `logpdf` and the weighted method-of-moments `estimate` are pure
functions usable inside jitted AMIS steps (and vmappable across a batch of
lockstep samplers).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

__all__ = ["Dirichlet", "dirichlet_logpdf", "dirichlet_estimate"]


def dirichlet_logpdf(a, ss):
    """
    Log-density of Dirichlet(a) at samples ``ss`` (``(N, k+1)``) -> ``(N,)``.

    Edge cases follow the reference's scipy-exception semantics
    (``bild/amis.py:83-108``): a zero coordinate contributes +inf when the
    corresponding ``a < 1`` (density diverges there), -inf when ``a > 1``
    (density vanishes), and 0 when ``a == 1``.
    """
    a = jnp.asarray(a)
    ss = jnp.asarray(ss)
    lognorm = jnp.sum(gammaln(a)) - gammaln(jnp.sum(a))
    zero = ss <= 0
    terms = jnp.where(
        zero,
        jnp.where(a[None, :] < 1, jnp.inf, jnp.where(a[None, :] > 1, -jnp.inf, 0.0)),
        (a[None, :] - 1) * jnp.log(jnp.where(zero, 1.0, ss)),
    )
    return jnp.sum(terms, axis=-1) - lognorm


def dirichlet_estimate(ss, log_weights):
    """
    Weighted method-of-moments estimate (reference ``bild/amis.py:110-151``):
    mean positions m, variances v, total concentration ``A = mean(m(1-m)/v)-1``,
    result ``A*m``. Degenerate zero-variance ensembles return a very
    concentrated (finite) distribution, to be reined in by the concentration
    brake.
    """
    ss = jnp.asarray(ss)
    log_weights = jnp.asarray(log_weights)
    w = jnp.exp(log_weights - jnp.max(log_weights))
    w = w / jnp.sum(w)

    m = w @ ss
    v = w @ (ss - m[None, :]) ** 2

    # degenerate (zero-variance) ensembles: the tolerance guards against pure
    # round-off variance (e.g. k=0, where every s is exactly 1 up to fp error
    # in the weight normalization), which would otherwise produce enormous or
    # even negative concentrations
    degenerate = v <= 1e-12
    safe_v = jnp.where(degenerate, 1.0, v)
    s = jnp.mean(m * (1 - m) / safe_v) - 1
    s = jnp.where(jnp.any(degenerate), 1e10, s)
    return s * m


class Dirichlet:
    """Thin stateless wrapper bundling sample/logpdf/estimate."""

    def sample(self, key, a, N=1):
        """``(N, k+1)`` draws from Dirichlet(a)."""
        return jax.random.dirichlet(key, jnp.asarray(a), shape=(N,))

    def logpdf(self, a, ss):
        return dirichlet_logpdf(a, ss)

    def estimate(self, ss, log_weights):
        return dirichlet_estimate(ss, log_weights)
