"""
Benchmark: batched Rouse-Kalman likelihood throughput on the default device.

Config matches the BASELINE.md headline workload: 2-state Rouse model at the
reference scale (N=20 monomers), 3-d dual-color trajectory, T=100 frames,
scored for a batch of P=8192 candidate profiles — the dispatch shape of
dataset (lockstep) mode, where B trajectories x N proposals land in one
kernel call. This is the kernel that dominates every BILD inference
(reference hot path: ``bild/src/MSRouse_logL.pyx``, called ~20k times per
k-sampler). The TPU path is the symmetric-packed Pallas kernel
(``ops/kalman_sym.py``). Throughput is batch-dependent (a fixed ~0.8-1 ms
per-call cost on this platform): ~150k/s at P=128 up to ~700k/s at P=8192.

Baseline = the sequential float64 NumPy transcription of the reference
algorithm (``bild_tpu/ops/oracle.py``) on one host CPU thread, i.e. the
reference's own execution model (it explicitly rejects parallelism,
``bild/amis.py:732-733``).

Prints ONE JSON line:
  {"metric": "logL_evals_per_sec", "value": ..., "unit": "profiles/s",
   "vs_baseline": ...}
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def supervised_main(attempts=(480, 480, 1800)):
    """
    Re-exec the benchmark in a child process with per-attempt timeouts.

    The axon remote-TPU plugin intermittently hangs a NEW process's first
    device operation (the process blocks at 0% CPU before any compile,
    ~50% of cold starts in this environment); the reliable remedy is to
    kill and relaunch the same script. This wrapper automates that: each
    attempt runs the real benchmark; a hung attempt is killed at its
    timeout and retried. Output/semantics are unchanged — the child's one
    JSON line is reprinted verbatim; if every attempt fails, exit 1 with
    the last stderr tail (an honest failure, never a fabricated number).
    The last attempt gets 30 min: the tunnel intermittently degrades to
    minutes per compiled-program LOAD (measured 2026-08-19, DESIGN.md 7j)
    while device compute itself is unaffected, and a long attempt still
    reports an honest steady-state rate because timing happens inside one
    on-device fori_loop after warmup.
    """
    last_err = ""
    for timeout_s in attempts:
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "BILD_BENCH_CHILD": "1"},
                timeout=timeout_s, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            last_err = f"attempt timed out after {timeout_s}s (axon init hang?)"
            print(last_err, file=sys.stderr, flush=True)
            continue
        lines = [l for l in p.stdout.strip().splitlines() if l.strip()]
        if p.returncode == 0 and lines:
            print(lines[-1])
            return 0
        last_err = p.stderr[-2000:]
        print(f"bench child rc={p.returncode}; retrying", file=sys.stderr,
              flush=True)
    print(f"bench failed after {len(attempts)} attempts: {last_err}",
          file=sys.stderr)
    return 1


def main():
    import jax
    import jax.numpy as jnp

    from bild_tpu.config import enable_compilation_cache
    enable_compilation_cache()

    from bild_tpu.models import MultiStateRouse
    from bild_tpu.ops.kalman import msrouse_logL_batch
    from bild_tpu.ops.oracle import msrouse_logL_numpy
    from bild_tpu.trajectory import Trajectory

    P, T = 8192, 100
    rng = np.random.default_rng(685441950)

    model = MultiStateRouse(20, 1.0, 5.0, d=3, localization_error=0.1)
    true_prof = ((np.arange(T) // 25) % 2).astype(int)
    traj = model.trajectory_from_loopingprofile(true_prof, key=jax.random.key(0))

    profiles = rng.integers(0, 2, size=(P, T)).astype(np.int32)

    # --- device path -----------------------------------------------------
    # Timing methodology: repeat the kernel inside ONE jitted fori_loop and
    # fetch the result. On the remote-TPU (axon) platform, per-call timing
    # with block_until_ready is unreliable (returns early in some program
    # states), so the repeat loop lives on device and the wall clock spans a
    # single dispatch + final host fetch.
    import functools

    from bild_tpu.config import resolve_matmul
    from bild_tpu.ops.kalman_sym import msrouse_logL_pallas_sym

    s2, Cind = model._noise_arrays(traj)
    profiles_dev = jnp.asarray(profiles)
    # the shipped dataset-mode default: config 'auto' resolves to the
    # split-bf16 tier in the lockstep context (what sample_dataset runs)
    kernel = (functools.partial(msrouse_logL_pallas_sym,
                                matmul=resolve_matmul("lockstep"))
              if jax.default_backend() not in ("cpu",) else msrouse_logL_batch)

    n_rep = 10

    @jax.jit
    def timed_loop(s2):
        def body(i, acc):
            out = kernel(model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s,
                         model.w, s2 + i * 1e-30, Cind,
                         profiles_dev, traj.data, traj.valid)
            return acc + out[0]
        return jax.lax.fori_loop(0, n_rep, body, 0.0)

    np.asarray(timed_loop(s2))  # compile + warmup
    t0 = time.perf_counter()
    np.asarray(timed_loop(s2))
    dt = (time.perf_counter() - t0) / n_rep
    rate_device = P / dt

    # --- baseline: sequential float64 oracle on host ---------------------
    Bs, Gs, Sigs, M0s, C0s = (np.asarray(a) for a in
                              (model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s))
    w = np.asarray(model.w)
    err = model._get_noise(traj)
    trajdata = traj[:]

    n_base = 16
    t0 = time.perf_counter()
    for p in profiles[:n_base]:
        msrouse_logL_numpy(Bs, Gs, Sigs, M0s, C0s, w, err, p, trajdata)
    dt_base = (time.perf_counter() - t0) / n_base
    rate_base = 1.0 / dt_base

    print(json.dumps({
        "metric": "logL_evals_per_sec",
        "value": round(rate_device, 1),
        "unit": "profiles/s",
        "vs_baseline": round(rate_device / rate_base, 2),
    }))


if __name__ == "__main__":
    if os.environ.get("BILD_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(supervised_main())
