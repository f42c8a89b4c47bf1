"""
Generic Gaussian-process model. Reference parity: ``GenericGaussianModel``,
``bild/models.py:536-728``.

Pure states are Gaussian processes specified by their MSD; the likelihood of
a profile factorizes over constant-state intervals, with trajectory
continuity enforced by conditioning each interval on the last observation of
the previous one (a rank-1 Schur complement of the interval covariance).

The interval structure is data-dependent (ragged), so covariance assembly
runs on host; per-interval dense solves use numpy (float64 - these are
O(len^3) on small blocks and are not the framework's hot path; the Rouse
Kalman kernel is).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
from scipy import linalg as sp_linalg

from ..physics import gp
from ..physics.rouse import two_locus_msd
from ..profiles import Loopingprofile
from ..trajectory import Trajectory
from .base import MultiStateModel

__all__ = ["GenericGaussianModel"]

LOG_2PI = float(np.log(2.0 * np.pi))


class GenericGaussianModel(MultiStateModel):
    """
    ``state_spec`` is an ``(nStates, d)`` nested sequence of
    ``(msd_fun, mean, ss_order)`` triples; ``ss_order`` is 0 (positionally
    stationary) or 1 (increment-stationary). See reference
    ``bild/models.py:557-564``.
    """

    def __init__(self, state_spec):
        self.state_spec = np.asarray(state_spec, dtype=object)
        assert len(self.state_spec.shape) == 3
        self.init_transitions(self.state_spec.shape[0])
        # per-interval likelihood cache: profile likelihoods decompose over
        # constant-state intervals, and AMIS proposals re-visit the same
        # intervals constantly -- memoizing the interval contribution makes
        # batched evaluation tractable without a device formulation of the
        # (inherently ragged) blockwise GP likelihood
        self._interval_memo = {}
        self._memo_traj = None

    # -- MSD constructors (reference ``bild/models.py:583-599``) -----------
    @staticmethod
    def MSD_function_powerlaw(G=1.0, a=1.0, noise2=0.0, motion_blur_f=0.0):
        @gp.MSDfun
        @gp.imaging(noise2=noise2, f=motion_blur_f, alpha0=a)
        def msd(dt, G=G, a=a):
            return G * dt**a

        return msd

    @staticmethod
    def MSD_function_twoLocusRouse(G=1.0, J=1.0, noise2=0.0, motion_blur_f=0.0):
        @gp.MSDfun
        @gp.imaging(noise2=noise2, f=motion_blur_f, alpha0=0.5)
        def msd(dt, G=G, J=J):
            return two_locus_msd(dt, G, J)

        return msd

    @property
    def d(self):
        return self.state_spec.shape[1]

    def initial_loopingprofile(self, traj):  # pragma: no cover
        # parity with the reference (bild/models.py:605-606)
        raise NotImplementedError

    def clear_memo(self):
        self._interval_memo = {}
        self._memo_traj = None

    # -- likelihood (reference ``bild/models.py:608-661``) -----------------
    def _interval_logL(self, trajdata, t0, t1, n, is_first) -> float:
        """Likelihood contribution of frames [t_start, t1) in state ``n``,
        conditioned on the last frame of the previous interval unless
        ``is_first``."""
        key = (t0, t1, n, is_first)
        if key in self._interval_memo:
            return self._interval_memo[key]

        t_start = t0 if is_first else t0 - 1  # continuity conditioning
        logL = 0.0
        for dim in range(self.d):
            trace = trajdata[t_start:t1][:, dim]
            ti = np.nonzero(~np.isnan(trace))[0]
            trace = trace[ti]

            msd_fun, m, ss_order = self.state_spec[n, dim]
            C = gp.msd2C(msd_fun, ti, ss_order)

            if ss_order == 0:
                x = trace - m
                if not is_first:
                    # condition on the last datum of the previous interval
                    mu = trace[0] * C[1:, 0] / C[0, 0]
                    x = x[1:] - mu
                    C = C - C[:, [0]] * C[[0], :] / C[0, 0]
                    C = C[1:, 1:]
            elif ss_order == 1:
                x = np.diff(trace) - m
            else:  # pragma: no cover
                raise ValueError(f"ss_order should be 0 or 1; got {ss_order}")

            _, logdet = np.linalg.slogdet(C)
            xCx = x @ np.linalg.solve(C, x)
            logL += -0.5 * (xCx + logdet + len(C) * LOG_2PI)

        self._interval_memo[key] = float(logL)
        return self._interval_memo[key]

    def logL(self, profile, traj) -> float:
        if self._memo_traj is not traj and self._memo_traj != traj:
            self._interval_memo = {}
            self._memo_traj = traj

        profile = Loopingprofile(np.asarray(profile))
        ivs = profile.intervals()
        ivs[0] = (0, ivs[0][1], ivs[0][2])
        ivs[-1] = (ivs[-1][0], len(profile), ivs[-1][2])

        trajdata = traj[:]  # NaN-sentinel (T, d) view
        return float(sum(
            self._interval_logL(trajdata, t0, t1, n, i == 0)
            for i, (t0, t1, n) in enumerate(ivs)
        ))

    # -- generative model (reference ``bild/models.py:663-728``) -----------
    def trajectory_from_loopingprofile(self, profile, missing_frames=None,
                                       rng: Optional[np.random.Generator] = None) -> Trajectory:
        rng = np.random.default_rng() if rng is None else rng
        profile = Loopingprofile(np.asarray(profile))
        missing_frames = self._preproc_missing_frames(missing_frames, len(profile))

        ivs = profile.intervals()
        ivs[-1] = (ivs[-1][0], len(profile), ivs[-1][2])

        snippets = []
        for i, (t0, t1, n) in enumerate(ivs):
            t_start = 0 if i == 0 else t0 - 1
            snippets.append([])
            for dim in range(self.d):
                ti = np.arange(t_start, t1)
                msd_fun, m, ss_order = self.state_spec[n, dim]
                continuing = ss_order == 0 and i > 0

                C = gp.msd2C(msd_fun, ti, ss_order)
                if continuing:
                    mu = (snippets[i - 1][dim][-1] - m) * C[1:, 0] / C[0, 0]
                    C = C - C[:, [0]] * C[[0], :] / C[0, 0]
                    C = C[1:, 1:]

                L = sp_linalg.cholesky(C, lower=True)
                x = L @ rng.standard_normal(len(L)) + m
                if continuing:
                    x += mu

                if ss_order == 0:
                    snippets[i].append(x)
                else:  # increments -> integrate, anchored at previous end (or 0)
                    x0 = 0.0 if i == 0 else snippets[i - 1][dim][-1]
                    cum = x0 + np.cumsum(x)
                    snippets[i].append(np.insert(cum, 0, 0) if i == 0 else cum)

        data = np.concatenate([np.array(snip).T for snip in snippets])
        data[missing_frames] = np.nan
        return Trajectory.create(data, loopingprofile=profile.state)
