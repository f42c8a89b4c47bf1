"""
Dataset-scale inference driver: the loop the reference tells users to write
themselves (reference ``bild/amis.py:732-733`` rejects parallelism; its
users iterate `bild.sample` over trajectories). `sample_dataset` owns the
whole pipeline:

    ragged trajectories -> length buckets -> fixed-size chunks
      -> lockstep `sample_batch` per chunk (sharded over a mesh if given)
      -> per-chunk checkpoint files -> original-order DatasetResults

Chunking bounds device memory and compile shapes (every chunk of a bucket
reuses one compiled program); the per-chunk checkpoint makes 10k-trajectory
runs resumable at chunk granularity — kill it anywhere, rerun the same
command, completed chunks load from disk.
"""
from __future__ import annotations

import dataclasses
import hashlib
import os
from typing import List, Optional, Sequence

import numpy as np

import jax

from .batch import bucket_trajectories, sample_batch, TrajectoryBatch

__all__ = ["DatasetResults", "sample_dataset"]


@dataclasses.dataclass
class DatasetResults:
    """Per-trajectory results in the ORIGINAL dataset order; trajectories
    keep their true lengths (profiles/marginals are trimmed from bucket
    padding)."""

    k: np.ndarray                       # (K+1,)
    evidence: np.ndarray                # (B, K+1)
    evidence_se: np.ndarray             # (B, K+1)
    profiles_by_k: List[np.ndarray]     # B entries, each (K+1, T_i)
    dE: float = 0.0
    marginals: Optional[List[np.ndarray]] = None  # B entries, (K+1, n, T_i)
    optimized: Optional[List[np.ndarray]] = None  # B entries, (T_i,)
    eliminated: Optional[np.ndarray] = None       # (B,) postproc flags
    # (B, K+1) — CFC method-of-marginals converged for that (trajectory, k)
    # lockstep run (see BatchResults.mom_ok); True for skipped/padded k
    mom_ok: Optional[np.ndarray] = None
    # (B,) — likelihood evals spent per trajectory (schedule='adaptive' only)
    evals: Optional[np.ndarray] = None
    # (B,) — global trajectory ids (`sample_dataset_sharded` only; rows are
    # in ascending-id order)
    ids: Optional[np.ndarray] = None

    def best_k(self, dE=None) -> np.ndarray:
        dE = self.dE if dE is None else dE
        plausible = self.evidence >= (
            np.max(self.evidence, axis=1, keepdims=True) - dE)
        return np.argmax(plausible, axis=1)

    def best_profile(self, dE=None) -> List[np.ndarray]:
        bk = self.best_k(dE)
        return [p[k] for p, k in zip(self.profiles_by_k, bk)]

    def log_marginal_posterior(self, dE=None) -> List[np.ndarray]:
        if self.marginals is None:
            raise ValueError("run sample_dataset(..., marginals=True) first")
        from scipy.special import logsumexp
        if isinstance(dE, str) and dE == "average":
            out = []
            for ev, m in zip(self.evidence, self.marginals):
                finite = np.isfinite(ev)
                w = np.where(finite[:, None, None],
                             m + ev[:, None, None], -np.inf)
                logpost = logsumexp(w, axis=0)
                out.append(logpost - logsumexp(logpost, axis=0,
                                               keepdims=True))
            return out
        bk = self.best_k(dE)
        return [m[k] for m, k in zip(self.marginals, bk)]


def _chunk_tag(indices, batch, config_str):
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(indices).tobytes())
    h.update(np.asarray(batch.data).tobytes())
    h.update(config_str.encode())
    return h.hexdigest()[:16]


def sample_dataset(model, trajs: Sequence,
                   k_max=10,
                   steps_per_k=20,
                   N=128,
                   dE=0.0,
                   scout_steps=None,
                   refine_top=3,
                   informed_init=True,
                   marginals=False,
                   chunk_size=1024,
                   bucket_edges=(64, 128, 256, 512, 1024),
                   mesh=None,
                   key=None,
                   checkpoint_dir=None,
                   show_progress=False,
                   optimize_boundaries=False,
                   schedule="lockstep",
                   **sample_kw) -> DatasetResults:
    """
    Full-dataset lockstep inference over ragged trajectories.

    Parameters mirror `sample_batch` (scout_steps/refine_top enable the
    two-phase budget schedule) plus:

    chunk_size : int
        max trajectories per device dispatch (bounds memory; every chunk of
        a bucket reuses one compiled program).
    bucket_edges : sequence of int
        pad-to lengths for ragged trajectories (`bucket_trajectories`).
    checkpoint_dir : optional path
        directory for per-chunk result files. A rerun with the same
        trajectories and configuration loads completed chunks from disk
        instead of recomputing — chunk-granular resume for long runs. Files
        are keyed by a content hash of (chunk data, configuration, model
        fingerprint — `models.base.MultiStateModel.likelihood_fingerprint`),
        so a changed configuration or re-parametrized model recomputes
        rather than mixing results. Custom models without a fingerprint
        key on data/configuration only.
    show_progress : bool
        tqdm over chunks.
    optimize_boundaries : bool
        run the batched greedy boundary hill climb
        (`postproc.optimize_boundary_batch`) on each chunk's best profiles
        at the given ``dE``; results land in ``DatasetResults.optimized``
        with per-trajectory ``eliminated`` flags.
    schedule : "lockstep" | "adaptive"
        "lockstep" (default) runs the fixed ``steps_per_k`` schedule through
        `sample_batch`; "adaptive" runs the per-trajectory active-learning
        scheduler (`infer.adaptive.sample_batch_adaptive` — the reference's
        evidence-driven budget allocation and certainty-based stopping,
        ``bild/core.py:138-227``, at dataset scale). Adaptive-specific knobs
        (``init_steps``, ``steps_per_round``, ``max_steps_per_k``,
        ``certainty_in_k``, ...) pass through ``**sample_kw``;
        ``steps_per_k``/``scout_steps``/``refine_top`` are lockstep-only and
        ignored under "adaptive". Adaptive mode is single-process (no
        ``mesh``) in this release.

    Returns `DatasetResults` in the original trajectory order.

    Multi-host execution: pass a process-spanning ``mesh``
    (``make_mesh(distributed=True)``) and launch this SAME call on every
    process with the IDENTICAL dataset, configuration, and key (a ``None``
    key is made safe by broadcasting process 0's draw). Each chunk then
    runs as one global SPMD program whose batch axis spans all hosts'
    devices; host-side prep and result assembly execute identically on
    every process, and every process returns the same full
    `DatasetResults`. Checkpoint files are written by process 0 only
    (exactly-once I/O); resume requires ``checkpoint_dir`` on a filesystem
    readable by every process. Divergent datasets/configurations across
    processes are detected at entry and raise.
    """
    if "ensemble" in sample_kw:
        # per-(trajectory, k) ensembles are a sample_batch-level payload;
        # silently dropping them here would waste the extra compute
        raise ValueError(
            "ensemble= is not carried through DatasetResults — run "
            "parallel.sample_batch(..., ensemble=M) directly (e.g. via "
            "fit.calibrate_rouse) for posterior profile ensembles")
    multiproc = False
    if mesh is not None:
        from .mesh import broadcast_from_process0, is_multiprocess
        multiproc = is_multiprocess(mesh)
    if key is None:
        seed = np.random.randint(2**31)
        if multiproc:
            seed = int(broadcast_from_process0(np.int64(seed)))
        key = jax.random.key(seed)
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)

    # extra sample_batch kwargs (e.g. mom_maxiter) change results, so they
    # must key the chunk checkpoints too (appended only when present, so
    # checkpoints of plain runs stay valid across versions)
    if schedule not in ("lockstep", "adaptive"):
        raise ValueError(f"schedule must be 'lockstep' or 'adaptive', "
                         f"got {schedule!r}")
    if schedule == "adaptive" and mesh is not None:
        raise ValueError("schedule='adaptive' does not support a mesh yet "
                         "(per-trajectory decisions are single-process)")

    config = ("v1", k_max, steps_per_k, N, scout_steps, refine_top,
              informed_init, marginals, chunk_size,
              bool(optimize_boundaries), float(dE),
              np.asarray(jax.random.key_data(key)).tolist())
    if schedule != "lockstep":
        # appended only for non-default schedules: lockstep checkpoints
        # written before this option keep resuming
        config += (schedule,)
    if sample_kw:
        config += (sorted(sample_kw.items()),)
    # a re-parametrized model (e.g. after a calibration round) must not
    # load chunks computed at the old parameters; models that cannot
    # fingerprint (custom subclasses, fingerprint None) key on
    # data/configuration only, as before
    fingerprint = getattr(model, "likelihood_fingerprint", lambda: None)()
    if fingerprint is not None:
        config += (fingerprint,)
    config_str = repr(config)

    if multiproc:
        # SPMD guard: every process must be walking the identical dataset +
        # configuration, or the per-chunk global programs would diverge
        # (wrong results at best, a collective deadlock at worst)
        h = hashlib.sha256(config_str.encode())
        for t in trajs:
            h.update(np.ascontiguousarray(np.asarray(t.data)).tobytes())
            h.update(np.ascontiguousarray(np.asarray(t.valid)).tobytes())
        digest = np.frombuffer(h.digest()[:8], dtype=np.int64)[0]
        if int(broadcast_from_process0(digest)) != int(digest):
            raise ValueError(
                "sample_dataset multi-process launch diverged: this "
                "process's (dataset, configuration, key) differs from "
                "process 0's — every process must pass identical inputs")

    B_total = len(trajs)
    K1 = k_max + 1
    evidence = np.full((B_total, K1), np.nan)
    evidence_se = np.full((B_total, K1), np.nan)
    profiles_by_k: List[Optional[np.ndarray]] = [None] * B_total
    margs_by_traj: List[Optional[np.ndarray]] = [None] * B_total
    opt_by_traj: List[Optional[np.ndarray]] = [None] * B_total
    elim_all = np.zeros(B_total, dtype=bool)
    mom_all = np.ones((B_total, K1), dtype=bool)
    evals_all = np.zeros(B_total, dtype=np.int64)

    # stable chunk schedule: bucket, then split each bucket
    work = []
    for idx, batch in bucket_trajectories(trajs, bucket_edges=bucket_edges):
        for lo in range(0, len(idx), chunk_size):
            sl = slice(lo, lo + chunk_size)
            sub = TrajectoryBatch(
                data=batch.data[sl], valid=batch.valid[sl],
                lengths=None if batch.lengths is None else batch.lengths[sl])
            work.append((idx[sl], sub))

    iterator = work
    if show_progress:
        try:
            from tqdm.auto import tqdm
            iterator = tqdm(work, desc="chunks")
        except ImportError:
            pass

    for c, (indices, sub) in enumerate(iterator):
        ck_path = None
        loaded = None
        if checkpoint_dir is not None:
            tag = _chunk_tag(indices, sub, config_str)
            ck_path = os.path.join(checkpoint_dir, f"chunk_{tag}.npz")
            hit = os.path.exists(ck_path)
            if multiproc:
                # process 0 decides (exactly-once semantics even if hosts
                # see different filesystems); a hit every process cannot
                # read is a hard error rather than silent recompute
                hit = bool(broadcast_from_process0(np.int64(hit)))
                if hit and not os.path.exists(ck_path):
                    raise FileNotFoundError(
                        f"process 0 has checkpoint {ck_path} but this "
                        f"process cannot read it; multi-process resume "
                        f"needs checkpoint_dir on a shared filesystem")
            if hit:
                loaded = np.load(ck_path)

        if loaded is not None:
            ev, se = loaded["evidence"], loaded["evidence_se"]
            maps = loaded["map_profiles"]
            marg = loaded["marginals"] if marginals else None
            opt = loaded["optimized"] if optimize_boundaries else None
            elim = loaded["eliminated"] if optimize_boundaries else None
            mom = (loaded["mom_ok"] if "mom_ok" in loaded.files
                   else np.ones_like(ev, dtype=bool))
            evl = (loaded["evals"] if "evals" in loaded.files
                   and loaded["evals"].size else None)
        else:
            if schedule == "adaptive":
                from ..infer.adaptive import sample_batch_adaptive
                res = sample_batch_adaptive(
                    model, sub, k_max=k_max, N=N, dE=dE,
                    informed_init=informed_init, marginals=marginals,
                    key=jax.random.fold_in(key, c), **sample_kw)
            else:
                res = sample_batch(
                    model, sub, k_max=k_max, steps_per_k=steps_per_k, N=N,
                    dE=dE, scout_steps=scout_steps, refine_top=refine_top,
                    informed_init=informed_init, marginals=marginals,
                    mesh=mesh, key=jax.random.fold_in(key, c), **sample_kw)
            ev, se, maps = res.evidence, res.evidence_se, res.map_profiles
            marg = res.marginals
            mom = res.mom_ok
            evl = res.evals
            opt = elim = None
            if optimize_boundaries:
                from ..postproc import optimize_boundary_batch
                opt, elim = optimize_boundary_batch(res.best_profile(dE),
                                                    sub, model)
            if ck_path is not None and not (multiproc
                                            and jax.process_index() != 0):
                tmp = ck_path + ".tmp.npz"
                np.savez(tmp, evidence=ev, evidence_se=se,
                         map_profiles=maps,
                         marginals=(marg if marginals else np.zeros(0)),
                         optimized=(opt if opt is not None else np.zeros(0)),
                         eliminated=(elim if elim is not None
                                     else np.zeros(0)),
                         mom_ok=mom,
                         evals=(evl if evl is not None else np.zeros(0)))
                os.replace(tmp, ck_path)

        k_here = ev.shape[1]
        lengths = (np.asarray(sub.lengths) if sub.lengths is not None
                   else np.full(len(indices), sub.T))
        for row, i in enumerate(np.asarray(indices)):
            evidence[i, :k_here] = ev[row]
            evidence[i, k_here:] = -np.inf
            evidence_se[i, :k_here] = se[row]
            evidence_se[i, k_here:] = 1e-10
            mom_all[i, :k_here] = mom[row]
            if evl is not None:
                evals_all[i] = evl[row]
            Ti = int(lengths[row])
            prof = np.zeros((K1, Ti), dtype=int)
            prof[:k_here] = maps[:, row, :Ti]
            profiles_by_k[i] = prof
            if marginals:
                n = marg.shape[2]
                m = np.full((K1, n, Ti), -np.inf)
                m[:k_here] = marg[:, row, :, :Ti]
                margs_by_traj[i] = m
            if optimize_boundaries:
                opt_by_traj[i] = np.asarray(opt[row, :Ti], dtype=int)
                elim_all[i] = bool(elim[row])

    return DatasetResults(
        k=np.arange(K1),
        evidence=evidence,
        evidence_se=evidence_se,
        profiles_by_k=profiles_by_k,
        dE=dE,
        marginals=margs_by_traj if marginals else None,
        optimized=opt_by_traj if optimize_boundaries else None,
        eliminated=elim_all if optimize_boundaries else None,
        mom_ok=mom_all,
        evals=evals_all if schedule == "adaptive" else None,
    )
