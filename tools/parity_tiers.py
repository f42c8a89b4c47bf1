"""
Measure the Rouse-Kalman kernel parity tiers on the current default device
(TPU when available) against the sequential f64 oracle, at the BASELINE.md
parity config (2-state Rouse N=20 d=3, T=100, 64 random profiles — the same
workload as bench_e2e config 2).

Tiers measured in THIS process (f32 compute):
  - sym kernel, matmul='exact'   (the shipped single-dispatch default)
  - sym kernel, matmul='split'   (the shipped dataset-mode default)
  - XLA scan kernel f32
  - square-root (Cholesky-factor) kernel f32  (ops/kalman_sqrt)

Run with --x64 in a SEPARATE process to measure the f64-on-TPU validation
tier (x64 is a process-global JAX config): the XLA scan kernel under
jax_enable_x64.

Each tier also gets a rough throughput number (same on-device fori_loop
methodology as bench.py, smaller P for the slow tiers) so the
parity/throughput trade is recorded together.

Usage:  python tools/parity_tiers.py [--x64] [--out FILE]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--x64", action="store_true",
                    help="enable jax x64 and measure the f64-on-device tier")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from bild_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    from bild_tpu.models import MultiStateRouse
    from bild_tpu.ops.kalman import msrouse_logL_batch
    from bild_tpu.ops.kalman_sqrt import msrouse_logL_sqrt
    from bild_tpu.ops.kalman_sym import msrouse_logL_pallas_sym
    from bild_tpu.ops.oracle import msrouse_logL_numpy

    rng = np.random.default_rng(2)
    model = MultiStateRouse(20, 1.0, 5.0, d=3, localization_error=0.1)
    truth = np.zeros(100, dtype=int)
    truth[30:60] = 1
    truth[75:90] = 1
    traj = model.trajectory_from_loopingprofile(truth, key=jax.random.key(42))
    profiles = rng.integers(0, 2, size=(64, 100))

    s2, Cind = model._noise_arrays(traj)
    kargs = (model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s,
             model.w, s2, Cind, jnp.asarray(profiles), traj.data, traj.valid)

    oracle = np.array([
        msrouse_logL_numpy(*(np.asarray(x, dtype=np.float64) for x in
                             (model.Bs, model.Gs, model.Sigs, model.M0s,
                              model.C0s, model.w)),
                           model._get_noise(traj), p, traj[:])
        for p in profiles])

    def parity(vals):
        return float(np.max(np.abs((np.asarray(vals, dtype=float) - oracle)
                                   / oracle)))

    def throughput(fn, P_rep, n_rep=5):
        """evals/s via one on-device fori_loop over a P_rep-profile batch."""
        profs = jnp.asarray(rng.integers(0, 2, size=(P_rep, 100)),
                            dtype=jnp.int32)

        @jax.jit
        def loop(s2x):
            def body(i, acc):
                out = fn(model.Bs, model.Gs, model.Sigs, model.M0s,
                         model.C0s, model.w, s2x + i * 1e-30, Cind,
                         profs, traj.data, traj.valid)
                return acc + out[0]
            return jax.lax.fori_loop(0, n_rep, body, 0.0)

        np.asarray(loop(s2))
        t0 = time.perf_counter()
        np.asarray(loop(s2))
        return P_rep * n_rep / (time.perf_counter() - t0)

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "x64": bool(args.x64)}

    if args.x64:
        out["scan_f64"] = {
            "parity": parity(msrouse_logL_batch(*kargs)),
            "evals_per_s": throughput(msrouse_logL_batch, 1024),
        }
    else:
        import functools
        for mm in ("exact", "split"):
            fn = functools.partial(msrouse_logL_pallas_sym, matmul=mm)
            out[f"sym_{mm}"] = {
                "parity": parity(fn(*kargs)),
                "evals_per_s": throughput(fn, 8192),
            }
        out["scan_f32"] = {
            "parity": parity(msrouse_logL_batch(*kargs)),
            "evals_per_s": throughput(msrouse_logL_batch, 1024),
        }
        out["sqrt_f32"] = {
            "parity": parity(msrouse_logL_sqrt(*kargs)),
            "evals_per_s": throughput(msrouse_logL_sqrt, 256),
        }

    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
