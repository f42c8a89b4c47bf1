"""
Checkpointing for inference results.

The reference keeps all sampler state in in-memory lists with no
serialization (SURVEY.md section 5, "Checkpoint/resume: none"). Here the
sampler state is a fixed-shape array pytree by construction, so a checkpoint
is a flat ``.npz``: trajectory, per-sampler `AmisState` buffers, exhaustive
ensembles, and the diagnostics log. Models are NOT serialized (they contain
arbitrary host callables, e.g. scipy distributions); `load_results` takes
the model as an argument and revalidates ``nStates``.

A loaded `SamplingResults` supports everything the live one does — including
resuming sampling, since `FixedkSampler` state is restored exactly.
"""
from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp

from ..amis.sampler import AmisState, FixedkSampler
from ..config import fdtype
from ..infer.core import SamplingResults
from ..trajectory import Trajectory

__all__ = ["save_results", "load_results"]

_STATE_FIELDS = ("ss", "thetas", "logLs", "logdeltas", "a_params", "logps",
                 "evidences", "n_steps", "mom_ok")


def save_results(path, results: SamplingResults):
    """Serialize a `SamplingResults` to ``path`` (.npz)."""
    arrays = {}
    meta = {"dE": results.dE, "samplers": [], "log_keys": list(results.log.keys())}
    # models are not serialized (arbitrary host callables), but their
    # likelihood fingerprint is — load_results can then reject a model
    # that does not match the save-time one instead of silently resuming
    # with different parameters
    mdl = results.samplers[0].model if results.samplers else None
    fp = (getattr(mdl, "likelihood_fingerprint", lambda: None)()
          if mdl is not None else None)
    if fp is not None:
        meta["model_fingerprint"] = fp

    traj = results.traj
    arrays["traj_data"] = np.asarray(traj.data)
    arrays["traj_valid"] = np.asarray(traj.valid)
    if traj.localization_error is not None:
        arrays["traj_locerr"] = np.asarray(traj.localization_error)

    for key, val in results.log.items():
        arrays[f"log_{key}"] = np.asarray(val)

    for i, s in enumerate(results.samplers):
        smeta = {
            "k": s.k, "N": s.N, "brakes": list(s.brakes),
            "max_fev": s.max_fev, "max_fcomplete": s.max_fcomplete,
            "exhausted": bool(s.exhausted),
            "informed_init": bool(getattr(s, "informed_init", False)),
            "evidences": [list(map(float, e)) for e in s.evidences],
            "degenerate": not hasattr(s, "state"),
            "has_exhaustive": s._exhaustive is not None if hasattr(s, "_exhaustive") else False,
        }
        if not smeta["degenerate"]:
            for f in _STATE_FIELDS:
                arrays[f"s{i}_{f}"] = np.asarray(getattr(s.state, f))
            arrays[f"s{i}_key"] = jax.random.key_data(s.key)
        if smeta["has_exhaustive"]:
            for kk, vv in s._exhaustive.items():
                arrays[f"s{i}_ex_{kk}"] = np.asarray(vv)
        meta["samplers"].append(smeta)

    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_results(path, model) -> SamplingResults:
    """Restore a `SamplingResults`; ``model`` must match the one used at
    save time — enforced via `likelihood_fingerprint` when both sides
    provide one (custom models without a fingerprint are only checked for
    ``nStates`` consistency)."""
    with np.load(path, allow_pickle=False) as zf:
        arrays = {k: zf[k] for k in zf.files}
    meta = json.loads(bytes(arrays.pop("__meta__")).decode("utf-8"))

    fp_saved = meta.get("model_fingerprint")
    if fp_saved is not None:
        fp_now = getattr(model, "likelihood_fingerprint", lambda: None)()
        if fp_now is not None and fp_now != fp_saved:
            raise ValueError(
                f"{path}: model does not match the one used at save time "
                "(likelihood fingerprint mismatch) — resuming these "
                "samplers with different parameters would mix results")

    traj = Trajectory(
        data=jnp.asarray(arrays["traj_data"], dtype=fdtype()),
        valid=jnp.asarray(arrays["traj_valid"]),
        localization_error=(jnp.asarray(arrays["traj_locerr"], dtype=fdtype())
                            if "traj_locerr" in arrays else None),
    )

    samplers = []
    for i, smeta in enumerate(meta["samplers"]):
        s = FixedkSampler.__new__(FixedkSampler)
        s.k = smeta["k"]
        s.N = smeta["N"]
        s.brakes = tuple(smeta["brakes"])
        s.max_fev = smeta["max_fev"]
        s.max_fcomplete = smeta["max_fcomplete"]
        s.exhausted = smeta["exhausted"]
        s.traj = traj
        s.model = model
        s.T = len(traj)
        s.evidences = [tuple(e) for e in smeta["evidences"]]
        s._exhaustive = None
        s._steps_host = 0

        if not smeta["degenerate"]:
            if s.k != smeta["k"] or model.nStates != arrays[f"s{i}_logps"].shape[1]:
                raise ValueError("model/checkpoint mismatch")
            from ..amis.cfc import CFC
            from ..amis.sampler import _make_fused_steps
            import math
            s._fused = None
            s._per_traj = None
            s._steps_host = int(arrays[f"s{i}_n_steps"])
            try:
                s._per_traj, logL_fn = model.lockstep_fns_single(traj)
                s._fused = _make_fused_steps(logL_fn, s.N, s.T)
            except (AttributeError, ValueError):
                pass
            s.cfc = CFC(model.transitions)
            s._transitions = jnp.asarray(model.transitions)
            s.n = s.cfc.n
            s.logprior = float(
                sum(math.log(j + 1) for j in range(s.k))
                - s.cfc.N_total(s.k, log=True))
            s.S = arrays[f"s{i}_logLs"].shape[0]
            s.K1 = arrays[f"s{i}_ss"].shape[-1]
            s.k_pad = s.K1 - 1
            s.active = jnp.arange(s.K1) < (s.k + 1)
            s.key = jax.random.wrap_key_data(arrays[f"s{i}_key"])
            # rebuild a pending informed-proposal injection: it only fires
            # after the FIRST step, so it is still pending iff no step ran
            s._informed = None
            s.informed_init = bool(smeta.get("informed_init", False))
            if s.informed_init and int(arrays[f"s{i}_n_steps"]) == 0:
                from ..amis.sampler import informed_proposal
                guess = model.segment_guess(traj, s.k)
                if guess is not None:
                    a_inf, logp_inf = informed_proposal(
                        guess[0], guess[1], s.n, s.T)
                    a_full = np.ones(s.K1)
                    a_full[: s.k + 1] = a_inf
                    logp_full = np.full((s.n, s.K1), -np.log(s.n))
                    logp_full[:, : s.k + 1] = logp_inf
                    s._informed = (jnp.asarray(a_full, dtype=fdtype()),
                                   jnp.asarray(logp_full, dtype=fdtype()))
            fields = {}
            for f in _STATE_FIELDS:
                v = arrays[f"s{i}_{f}"]
                if f == "thetas":
                    v = jnp.asarray(v, dtype=jnp.int32)
                elif f == "n_steps":
                    v = jnp.asarray(v, dtype=jnp.int32)
                elif f == "mom_ok":
                    v = jnp.asarray(v, dtype=bool)
                else:
                    v = jnp.asarray(v, dtype=fdtype())
                fields[f] = v
            s.state = AmisState(**fields)

        if smeta["has_exhaustive"]:
            s._exhaustive = {
                kk[len(f"s{i}_ex_"):]: arrays[kk]
                for kk in arrays if kk.startswith(f"s{i}_ex_")
            }
        samplers.append(s)

    res = SamplingResults(traj, model, meta["dE"], samplers, log=None)
    res.log = {k[len("log_"):]: v for k, v in arrays.items() if k.startswith("log_")}
    return res
