"""
Optimal k-switch segmentation under a per-frame state-score table.

Given ``table[s, t]`` (e.g. the factorized per-frame log-likelihoods, the
same quantity behind the reference's frame-wise MLE guess,
``bild/models.py:453-481``), find the profile with EXACTLY ``k`` switches
(respecting the allowed-transition mask) maximizing ``sum_t table[profile[t], t]``.

Dynamic program over (switch count j, frame t, state s) with prefix sums and
a running max, O(k * T * n^2) — cheap host work even at T ~ 1e5. Used to
seed AMIS proposals at each k (`FixedkSampler(informed_init=True)`): the
uniform initial proposal struggles to find fine-grained switch positions at
long T (see DESIGN.md section 7); this segmentation is the natural informed
starting point, and the AMIS deterministic-mixture weighting keeps the
evidence estimate consistent regardless of the initial proposal.
"""
from __future__ import annotations

import numpy as np

__all__ = ["dp_segment", "dp_segment_all", "profile_to_st"]

# Sentinel for -inf / NaN score entries. Must be large enough that such a
# frame-state is never chosen when alternatives exist, yet small enough that
# prefix sums over T of it keep unit-scale score differences exactly
# representable in float64 (raw -inf through nan_to_num would catastrophically
# cancel in the prefix-sum subtraction and silently zero out ALL scores).
_SCORE_FLOOR = -1e6


def profile_to_st(profile):
    """Decompose an int profile into ``(interval_fractions, states)`` —
    the (s, theta) parameters whose `st2profile` image is the profile."""
    profile = np.asarray(profile, dtype=int)
    T = len(profile)
    bounds = np.concatenate([[0], np.nonzero(np.diff(profile))[0] + 1, [T]])
    return np.diff(bounds) / T, profile[bounds[:-1]]


def dp_segment(table, k, transitions=None):
    """
    Parameters
    ----------
    table : (n, T) float
        per-frame, per-state scores (higher = better); NaN treated as 0
        (missing frames score equally under every state); -inf clamped to a
        finite floor (never chosen when alternatives exist)
    k : int
        exact number of switches in the output profile
    transitions : (n, n) bool or None
        allowed transitions; default all-but-self

    Returns
    -------
    profile : (T,) int, or None if no k-switch profile exists (e.g. k >= T
        or the transition graph forbids it)
    score : float
    """
    profiles, scores = dp_segment_all(table, k, transitions)
    return profiles[k], scores[k]


def dp_segment_all(table, k_max, transitions=None):
    """
    Optimal segmentations for EVERY switch count ``k in 0..k_max`` from one
    DP sweep (layer j's state is exactly layer j+1's input, so all k share
    the forward pass; only backtracking is per k).

    Returns ``(profiles, scores)``: lists of length ``k_max + 1`` with
    ``profiles[k]`` an int array or None (infeasible k), ``scores[k]`` float.
    """
    table = np.nan_to_num(np.asarray(table, dtype=float),
                          nan=0.0, posinf=-_SCORE_FLOOR, neginf=_SCORE_FLOOR)
    table = np.clip(table, _SCORE_FLOOR, -_SCORE_FLOOR)
    n, T = table.shape
    if transitions is None:
        transitions = ~np.eye(n, dtype=bool)
    transitions = np.asarray(transitions, dtype=bool)

    # prefix[s, t] = sum of table[s, :t]
    prefix = np.concatenate([np.zeros((n, 1)), np.cumsum(table, axis=1)], axis=1)

    NEG = -np.inf
    # D[t, s] = best score of frames [0, t] (inclusive) ending in state s
    # with exactly j switches, where the last switch is anywhere <= t.
    # Layer j=0: single segment.
    D = prefix[:, 1:].T.copy()                      # (T, s): prefix[s, t+1]
    parent = []                                     # per layer: (T, s) switch frame
    finals = [D[T - 1].copy()]                      # per layer: final-frame row

    for j in range(1, k_max + 1):
        # best previous-layer value at switch position t' (profile switches
        # INTO s at frame t'+1): cand[t', s] = max_{s' -> s} D_prev[t', s']
        # minus the new state's prefix at the switch.
        Dp = np.where(np.isfinite(D), D, NEG)       # (T, s')
        # max over allowed predecessors for each target state
        cand = np.full((T, n), NEG)
        arg_sprev = np.zeros((T, n), dtype=int)
        for s in range(n):
            allowed = transitions[:, s]
            if not np.any(allowed):
                continue
            vals = np.where(allowed[None, :], Dp, NEG)   # (T, s')
            arg_sprev[:, s] = np.argmax(vals, axis=1)
            cand[:, s] = vals[np.arange(T), arg_sprev[:, s]]
        # subtract prefix of the new state up to the switch: score of the new
        # segment (t'+1 .. t) = prefix[s, t+1] - prefix[s, t'+1]
        adj = cand - prefix[:, 1:].T                 # (t', s)
        # running max over t' < t
        run = np.maximum.accumulate(adj[:-1], axis=0)            # (T-1, s)
        argrun = np.zeros((T - 1, n), dtype=int)
        for s in range(n):
            better = np.concatenate([[True], adj[1:-1, s] > run[:-1, s]])
            argrun[:, s] = np.where(better, np.arange(T - 1), 0)
            argrun[:, s] = np.maximum.accumulate(argrun[:, s])
        D_new = np.full((T, n), NEG)
        D_new[1:] = run + prefix[:, 2:].T            # score at frame t = run[t-1] + prefix[s, t+1]
        parent.append((argrun, arg_sprev))
        finals.append(D_new[T - 1].copy())
        D = D_new

    profiles, scores = [], []
    for k in range(k_max + 1):
        if k >= T or not np.any(np.isfinite(finals[k])):
            profiles.append(None)
            scores.append(-np.inf)
            continue
        s_best = int(np.argmax(finals[k]))
        scores.append(float(finals[k][s_best]))

        profile = np.empty(T, dtype=int)
        t, s = T - 1, s_best
        for j in range(k, 0, -1):
            argrun, arg_sprev = parent[j - 1]
            t_switch = int(argrun[t - 1, s])         # last switch position t'
            profile[t_switch + 1 : t + 1] = s
            s = int(arg_sprev[t_switch, s])
            t = t_switch
        profile[: t + 1] = s
        profiles.append(profile)
    return profiles, scores
