"""
Downstream statistics for inferred profiles.

Reference parity: ``bild/stats.py`` (Kaplan-Meier survival on right-censored
dwell times; censored-exponential MLE with exact confidence bounds). Host
numpy/scipy: these post-process small host-side summaries.
"""
from __future__ import annotations

import numpy as np
from scipy import optimize, stats

__all__ = ["KM_survival", "MLE_censored_exponential"]


def KM_survival(data, censored, conf=0.95, Tmax=np.inf, S1at=0):
    """
    Kaplan-Meier survival estimator with Greenwood log-log confidence bands
    (reference ``bild/stats.py:7-65``).

    Returns ``(T, 4)`` array with columns ``t, S(t), lower(t), upper(t)``.
    """
    data = np.asarray(data)
    censored = np.asarray(censored).astype(bool)

    t = np.unique(data[~censored])
    t = t[t <= Tmax]
    S = np.zeros(len(t) + 1)
    S[0] = 1
    V = np.zeros(len(t) + 1)
    Vsum = 0.0
    for n, curt in enumerate(t, start=1):
        d_n = np.count_nonzero(data[~censored] == curt)
        N_n = np.count_nonzero(data >= curt)

        S[n] = S[n - 1] * (1 - d_n / N_n)
        if N_n > d_n:
            Vsum += d_n / (N_n * (N_n - d_n))
            V[n] = np.log(S[n]) ** (-2) * Vsum
        else:
            Vsum = np.inf
            V[n] = 0

    z = stats.norm().ppf((1 - conf) / 2)
    with np.errstate(over="ignore", invalid="ignore"):
        lower = S ** (np.exp(z * np.sqrt(V)))
        upper = S ** (np.exp(-z * np.sqrt(V)))

    if S1at is not None:
        t = np.insert(t, 0, S1at)
    else:
        S = S[1:]
        lower = lower[1:]
        upper = upper[1:]

    return np.stack([t, S, lower, upper], axis=-1)


def MLE_censored_exponential(data, censored, conf=0.95):
    """
    Maximum-likelihood mean of an exponential distribution from
    right-censored data, with exact confidence interval by root finding
    (reference ``bild/stats.py:67-110``). Returns ``(m, low, high)``.
    """
    data = np.asarray(data).flatten()
    censored = np.asarray(censored, dtype=bool).flatten()

    n = np.count_nonzero(~censored)
    alpha = 1 - conf

    m = np.sum(data) / n

    c = stats.chi2(1).isf(alpha) / (2 * n)

    def fitfun(beta):
        return np.exp(beta) - 1 - beta - c

    res = optimize.root_scalar(fitfun, bracket=(-c - 1, 0))
    if not res.converged:  # pragma: no cover
        raise RuntimeError("Root finding did not converge for upper confidence interval")
    beta_m = res.root

    res = optimize.root_scalar(fitfun, bracket=(0, 2 * np.sqrt(c)))
    if not res.converged:  # pragma: no cover
        raise RuntimeError("Root finding did not converge for lower confidence interval")
    beta_p = res.root

    return m, m * np.exp(-beta_p), m * np.exp(-beta_m)
