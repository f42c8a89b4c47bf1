"""
Kernel-parity ladder across the PERF config shapes (VERDICT r4 weak #1).

`tools/parity_tiers.py` bounds the split tier at ONE shape (T=100,
2-state). This tool measures worst-case parity vs the sequential f64
oracle for every Rouse PERF-config shape x profile family x kernel tier:

  shapes:   config 2/3 (2-state, N=20, d=3, T=100)
            config 4   (3-state incl. inner loop, T=1000)
            config 5   (= config 3 shape, larger B only — same kernel shape)
  families: 'random'   every-frame-random profiles (adversarial: maximal
                       state-switch density — what early uniform AMIS
                       proposals resemble)
            'segment'  piecewise-constant 0..6-switch profiles (what the
                       sampler actually converges to)
            'constant' single-state profiles
  tiers:    sym 'exact', sym 'split' (the shipped dataset default),
            XLA scan f32

Reported per cell: max |relative| error and max |absolute| error in NATS —
the decision-relevant scale: a kernel error is harmless iff it is small
against the evidence-gap SEs (~0.1-1 nat at the benched budgets).

Writes one JSON artifact; the per-config bound table lives in BASELINE.md.

Usage: python tools/parity_ladder.py [--out PARITY_LADDER.json]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _segment_profiles(rng, P, T, n_states, k_max=6):
    profs = np.zeros((P, T), dtype=int)
    for b in range(P):
        k = int(rng.integers(0, k_max + 1))
        cuts = np.sort(rng.choice(np.arange(1, T), size=k, replace=False))
        bounds = np.concatenate([[0], cuts, [T]])
        s = int(rng.integers(0, n_states))
        for i in range(k + 1):
            profs[b, bounds[i]:bounds[i + 1]] = s
            s = (s + 1 + int(rng.integers(0, max(n_states - 1, 1)))) % n_states
    return profs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_LADDER.json")
    ap.add_argument("--profiles", type=int, default=64)
    args = ap.parse_args()

    import functools
    import jax
    import jax.numpy as jnp
    from bild_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from bild_tpu.models import MultiStateRouse
    from bild_tpu.ops.kalman import msrouse_logL_batch
    from bild_tpu.ops.kalman_sym import msrouse_logL_pallas_sym
    from bild_tpu.ops.oracle import msrouse_logL_numpy

    shapes = {
        "config2_3_T100_2state": dict(
            model=MultiStateRouse(20, 1.0, 5.0, d=3, localization_error=0.1),
            T=100, n=2),
        "T300_2state": dict(        # threshold probe for the split policy
            model=MultiStateRouse(20, 1.0, 5.0, d=3, localization_error=0.1),
            T=300, n=2),
        "config4_T1000_3state": dict(
            model=MultiStateRouse(20, 1.0, 5.0, d=3,
                                  looppositions=(None, (0, -1), (0, 10)),
                                  localization_error=0.1),
            T=1000, n=3),
    }

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "n_profiles": args.profiles}

    for tag, spec in shapes.items():
        model, T, n = spec["model"], spec["T"], spec["n"]
        rng = np.random.default_rng(2)
        truth = np.zeros(T, dtype=int)
        truth[3 * T // 10: 6 * T // 10] = 1
        traj = model.trajectory_from_loopingprofile(
            truth, key=jax.random.key(42))

        families = {
            "random": rng.integers(0, n, size=(args.profiles, T)),
            "segment": _segment_profiles(rng, args.profiles, T, n),
            "constant": np.repeat(np.arange(n)[:, None], T, axis=1),
        }

        s2, Cind = model._noise_arrays(traj)
        f64 = [np.asarray(x, dtype=np.float64) for x in
               (model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s,
                model.w)]
        noise = model._get_noise(traj)

        tiers = {
            "sym_exact": functools.partial(msrouse_logL_pallas_sym,
                                           matmul="exact"),
            "sym_split": functools.partial(msrouse_logL_pallas_sym,
                                           matmul="split"),
            "scan_f32": msrouse_logL_batch,
        }

        cell = {}
        for fam, profs in families.items():
            oracle = np.array([msrouse_logL_numpy(*f64, noise, p, traj[:])
                               for p in profs])
            kargs = (model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s,
                     model.w, s2, Cind, jnp.asarray(profs, dtype=jnp.int32),
                     traj.data, traj.valid)
            cell[fam] = {"oracle_logL_scale": float(np.median(np.abs(oracle)))}
            for tier, fn in tiers.items():
                vals = np.asarray(fn(*kargs), dtype=float)
                rel = np.max(np.abs((vals - oracle) / oracle))
                err = vals - oracle
                cell[fam][tier] = {
                    "max_rel": float(rel),
                    "max_abs_nats": float(np.max(np.abs(err))),
                    # decision-relevant error: evidence/posterior COMPARISONS
                    # are invariant to a shift shared by every profile of
                    # the same trajectory, so the spread around the mean
                    # shift is what can flip a k decision
                    "max_centered_nats": float(np.max(np.abs(err - err.mean()))),
                }
            print(f"{tag}/{fam}: " + json.dumps(cell[fam]), flush=True)
        out[tag] = cell

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
