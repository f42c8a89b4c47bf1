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
    (reference ``bild/stats.py:7-65``), fully vectorized: event/at-risk
    counts via searchsorted on the sorted sample, survival via cumprod,
    Greenwood variance via cumsum.

    Returns ``(T, 4)`` array with columns ``t, S(t), lower(t), upper(t)``
    (column convention matches the reference: with ``z < 0`` column 2 is the
    numerically-upper band).
    """
    data = np.asarray(data, dtype=float)
    censored = np.asarray(censored).astype(bool)

    event_times = np.unique(data[~censored])
    event_times = event_times[event_times <= Tmax]

    # events at each time / individuals still at risk, all vectorized
    sorted_events = np.sort(data[~censored])
    sorted_all = np.sort(data)
    d = (np.searchsorted(sorted_events, event_times, side="right")
         - np.searchsorted(sorted_events, event_times, side="left"))
    n_at_risk = len(sorted_all) - np.searchsorted(sorted_all, event_times, side="left")

    frac = 1.0 - d / n_at_risk
    S = np.concatenate([[1.0], np.cumprod(frac)])

    # Greenwood variance of log(-log S); saturated steps (all at-risk die)
    # poison the running sum from that point on, matching the sequential
    # reference semantics
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(n_at_risk > d, d / (n_at_risk * (n_at_risk - d)), np.inf)
        greenwood = np.cumsum(terms)
        V = np.concatenate([[0.0], np.log(S[1:]) ** (-2) * greenwood])
        V[~np.isfinite(V)] = 0.0

        z = stats.norm().ppf((1 - conf) / 2)
        band_lo = S ** (np.exp(z * np.sqrt(V)))
        band_hi = S ** (np.exp(-z * np.sqrt(V)))

    if S1at is not None:
        t_out = np.concatenate([[S1at], event_times])
    else:
        t_out = event_times
        S, band_lo, band_hi = S[1:], band_lo[1:], band_hi[1:]

    return np.stack([t_out, S, band_lo, band_hi], axis=-1)


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
