"""
Information-gain driven sample selection across switch counts k.

Reference parity: ``ChoiceSampler``, ``bild/choicesampler.py``. Given the
evidence curve (point estimates, squared SEMs, sample counts) and the
evidence margin dE, Monte-Carlo-sample the "choice distribution" p(k) =
P(k is chosen best under the dE rule) and estimate the expected KL
information gain of (a) one more AMIS step at each k and (b) having explored
a region of k at all (the lookahead importance).

This is host-side control logic: tiny dense arrays (samplesize x kmax),
microseconds in numpy, re-created every driver iteration with a growing
kmax. Putting it on the remote device would cost more in dispatch latency
than the whole computation. Common random numbers across variants (reference
``bild/choicesampler.py:133-138``) are preserved — they are what makes the
KLD differences low-variance.
"""
from __future__ import annotations

import numpy as np

__all__ = ["ChoiceSampler"]


class ChoiceSampler:
    """
    Parameters
    ----------
    muhat : (k,) evidence point estimates
    shat : (k,) squared standard errors of muhat
    N : (k,) number of AMIS steps behind each estimate (inf = exhausted)
    dE : float, evidence margin
    samplesize : int, MC sample size
    rng : optional numpy Generator (defaults to the global RNG, matching the
        reference's implicit seeding)
    """

    def __init__(self, muhat, shat, N, dE, samplesize=10000, rng=None):
        self.dE = dE
        self.muhat = np.asarray(muhat, dtype=float)
        self.shat = np.asarray(shat, dtype=float)
        self.N = np.asarray(N, dtype=float)
        self.samplesize = samplesize
        self.kmax = len(self.muhat)

        # expected squared evidence update from one more sample at k
        self.EDmu2 = self.shat / (self.N + 1)
        self.Dmu = np.sqrt(self.EDmu2)

        self._rng = np.random if rng is None else rng
        self.init_sample()

    def init_sample(self):
        """(Re)draw the underlying common-random-number sample (reference
        ``bild/choicesampler.py:99-110``)."""
        self._scaled_rvs = np.sqrt(self.shat)[None, :] * self._rng.normal(
            size=(self.samplesize, self.kmax))

        self.bestk = self.evaluate()
        self.best_is_k = self.bestk[:, None] == np.arange(self.kmax)[None, :]
        self.n0 = np.sum(self.best_is_k, axis=0)

    def evaluate(self, k_change=None, n_step=0.0, omit_k=None):
        """
        Sample the choice distribution, optionally after moving ``muhat[k]``
        by ``n_step * Dmu[k]`` or pretending some k were never evaluated.
        The dE rule: among k whose evidence is within dE of the max, pick the
        smallest (reference ``bild/choicesampler.py:112-151``).
        """
        myM = self.muhat.copy()
        if k_change is not None:
            myM[k_change] += n_step * self.Dmu[k_change]
        if omit_k is not None:
            myM[omit_k] = -np.inf  # excluded from max and never within margin

        x = self._scaled_rvs + myM[None, :]       # (samp, k)
        m = np.max(x, axis=1, keepdims=True)
        return np.argmax(m - self.dE - x <= 0, axis=1)

    def Dn(self):
        """Expected histogram change ``[k_change, k]`` from one more sample
        at k_change (two-sided half-step difference, common random numbers)."""
        new_ks = np.array([[self.evaluate(k, step) for k in range(self.kmax)]
                           for step in (-0.5, 0.5)])               # (2, kc, samp)
        new_n = np.sum(new_ks[..., None] == np.arange(self.kmax), axis=-2)
        return new_n[1] - new_n[0]

    def KLD_moreSamples(self):
        """Expected KL information gain of one additional AMIS step at each k."""
        Dn = self.Dn()
        return 0.5 / self.samplesize * np.sum(Dn**2 / (self.n0 + 1)[None, :], axis=-1)

    def KLD_omitK(self, omit_k=None):
        """Information contributed by the k in ``omit_k`` (lookahead
        importance; reference ``bild/choicesampler.py:180-210``)."""
        old_k = self.evaluate(omit_k=omit_k)
        old_n = np.sum(old_k[:, None] == np.arange(self.kmax)[None, :], axis=0)
        old_n = old_n / np.sum(old_n) * self.samplesize

        Dn = self.n0 - old_n
        Dn[omit_k] = 0
        return 0.5 / self.samplesize * np.sum(Dn**2 / (old_n + 1))
