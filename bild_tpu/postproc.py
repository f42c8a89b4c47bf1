"""
Post-processing: greedy local optimization of profile boundaries.

Reference parity: ``bild/postproc.py``. TPU-native twist: each iteration
scores ALL candidate boundary moves (2 per boundary) in a single batched
likelihood call (`model.logL_batch`), replacing the reference's sequential
two-evaluations-per-boundary Python loop (``bild/postproc.py:46-58``).
"""
from __future__ import annotations

import numpy as np

from .profiles import Loopingprofile

__all__ = ["logLR_boundaries", "optimize_boundary", "BoundaryEliminationError"]


class BoundaryEliminationError(Exception):
    pass


def _candidate_moves(states):
    """All single-boundary moves of a profile.

    Returns (boundaries, candidates) where ``candidates[i, 0]`` moves
    boundary ``i`` left and ``candidates[i, 1]`` right.
    """
    boundaries = np.nonzero(np.diff(states))[0]  # boundary between b and b+1
    cands = np.empty((len(boundaries), 2, len(states)), dtype=int)
    for i, b in enumerate(boundaries):
        left = states.copy()
        left[b] = states[b + 1]
        right = states.copy()
        right[b + 1] = states[b]
        cands[i, 0] = left
        cands[i, 1] = right
    return boundaries, cands


def logLR_boundaries(profile, traj, model):
    """
    ``(k, 2)`` log-likelihood ratios for moving each boundary left/right
    (reference ``bild/postproc.py:13-59``), evaluated in one batch.
    """
    states = np.asarray(profile)[:]
    boundaries, cands = _candidate_moves(states)
    if len(boundaries) == 0:
        return np.array([])

    batch = np.concatenate([cands.reshape(-1, len(states)), states[None, :]])
    logLs = np.asarray(model.logL_batch(batch, traj), dtype=float)
    return logLs[:-1].reshape(len(boundaries), 2) - logLs[-1]


def optimize_boundary(profile, traj, model, max_iteration=10000):
    """
    Greedy hill climb on boundary positions (reference
    ``bild/postproc.py:64-117``). Raises `BoundaryEliminationError` if the
    best move would merge two boundaries (usually a sign of insufficient
    sampling), ``RuntimeError`` if ``max_iteration`` is exceeded.
    """
    profile_new = Loopingprofile(np.asarray(profile)[:].copy())
    for _ in range(max_iteration):
        logLR = logLR_boundaries(profile_new, traj, model)
        if len(logLR) == 0:
            break

        i, j = np.unravel_index(np.argmax(logLR), logLR.shape)
        if logLR[i, j] > 0:
            boundaries = np.nonzero(np.diff(profile_new.state))[0]
            if ((j == 0 and boundaries[i] == 0)
                    or (j == 0 and profile_new[boundaries[i] - 1] == profile_new[boundaries[i] + 1])
                    or (j == 1 and boundaries[i] == len(traj) - 2)
                    or (j == 1 and profile_new[boundaries[i] + 2] == profile_new[boundaries[i]])):
                raise BoundaryEliminationError(
                    f"Trying to abolish boundary at {boundaries[i]}")
            profile_new[boundaries[i] + j] = profile_new[boundaries[i] + (1 - j)]
        else:
            break
    else:
        raise RuntimeError(f"Exceeded max_iteration = {max_iteration}")

    return profile_new
