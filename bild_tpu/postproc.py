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
    Greedy hill climb on boundary positions (semantics of reference
    ``bild/postproc.py:64-117``). Raises `BoundaryEliminationError` if the
    best move would change the number of boundaries — i.e. shrink an
    interval to nothing, usually a sign the original sampling was too thin —
    and ``RuntimeError`` if ``max_iteration`` is exceeded.
    """
    states = np.asarray(profile)[:].copy()
    for _ in range(max_iteration):
        boundaries, cands = _candidate_moves(states)
        if len(boundaries) == 0:
            break

        batch = np.concatenate([cands.reshape(-1, len(states)), states[None, :]])
        logLs = np.asarray(model.logL_batch(batch, traj), dtype=float)
        gain = logLs[:-1].reshape(len(boundaries), 2) - logLs[-1]

        i, j = np.unravel_index(np.argmax(gain), gain.shape)
        if gain[i, j] <= 0:
            break
        winner = cands[i, j]
        # a legal move shifts a boundary; it never merges or drops one
        if np.count_nonzero(np.diff(winner)) != len(boundaries):
            raise BoundaryEliminationError(
                f"best move would eliminate the boundary after frame {boundaries[i]}")
        states = winner
    else:
        raise RuntimeError(f"Exceeded max_iteration = {max_iteration}")

    return Loopingprofile(states)
