"""
Minimal stand-in for the ``noctiluca`` package, providing exactly the surface
the reference ``bild`` package touches (``Trajectory``, ``make_Trajectory``;
see reference ``bild/core.py:9,111``, ``bild/models.py:17,347,531,728``).

Semantics follow noctiluca's single-locus Trajectory: ``traj[...]`` indexes
the ``(T, d)`` data array (missing frames are NaN rows), ``len(traj)`` is the
frame count, ``abs()`` maps to the per-frame Euclidean norm.
"""
import numpy as np


class Trajectory:
    def __init__(self, data, localization_error=None, **meta):
        data = np.asarray(data, dtype=float)
        if data.ndim == 1:
            data = data[:, None]
        if data.ndim == 3:
            # (N=1 or 2, T, d) multi-locus layout; reduce 2-locus to the
            # separation vector, matching noctiluca's relative() convention
            data = data[0] if data.shape[0] == 1 else data[1] - data[0]
        self.data = data
        if localization_error is not None:
            localization_error = np.broadcast_to(
                np.asarray(localization_error, dtype=float), (data.shape[1],)
            ).copy()
        self.localization_error = localization_error
        self.meta = dict(meta)

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, idx):
        return self.data[idx]

    @property
    def d(self):
        return self.data.shape[1]

    @property
    def T(self):
        return self.data.shape[0]

    def abs(self):
        out = Trajectory(np.linalg.norm(self.data, axis=1, keepdims=True),
                         localization_error=self.localization_error,
                         **self.meta)
        return out


def make_Trajectory(obj, **kwargs):
    if isinstance(obj, Trajectory):
        return obj
    return Trajectory(np.asarray(obj, dtype=float), **kwargs)
