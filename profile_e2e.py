"""Scratch: break down where config-3 lockstep wall time goes on the TPU."""
import time
import numpy as np


def main():
    import jax
    from bild_tpu.models import MultiStateRouse
    from bild_tpu.parallel import batch as pb
    from bild_tpu.parallel import sample_batch

    rng = np.random.default_rng(3)
    model = MultiStateRouse(20, 1.0, 5.0, d=3, localization_error=0.1)

    B, T = 128, 100
    from bench_e2e import _truth_profiles
    truths = _truth_profiles(rng, B, T, 2)
    batch = model.trajectories_from_loopingprofiles(truths, key=jax.random.key(0))

    kw = dict(k_max=4, steps_per_k=12, N=128, informed_init=True,
              key=jax.random.key(3))

    # warm
    res = sample_batch(model, batch, **kw)

    # total
    t0 = time.perf_counter()
    res = sample_batch(model, batch, **kw)
    total = time.perf_counter() - t0
    print(f"total warm: {total:.3f}s")

    # piece 1: lockstep_fns
    t0 = time.perf_counter()
    per_traj, logL_fn = model.lockstep_fns(batch)
    t_fns = time.perf_counter() - t0
    print(f"lockstep_fns: {t_fns:.3f}s")

    # piece 2: informed init
    t0 = time.perf_counter()
    informed = pb._informed_proposals_all_k(model, batch, 5, 2, T)
    jax.block_until_ready(jax.numpy.zeros(1))
    t_inf = time.perf_counter() - t0
    print(f"informed init: {t_inf:.3f}s")

    # piece 2a: segment tables alone
    t0 = time.perf_counter()
    seg = model.lockstep_segment_tables(batch)
    np.asarray(seg)
    t_seg = time.perf_counter() - t0
    print(f"  segment tables: {t_seg:.3f}s")

    from bild_tpu.infer.segment import dp_segment_all_batch
    seg_np = np.asarray(seg)
    t0 = time.perf_counter()
    profs, feas = dp_segment_all_batch(seg_np, 4, model.transitions)
    t_dp = time.perf_counter() - t0
    print(f"  dp_segment_all_batch: {t_dp:.3f}s")

    # piece 3: the 5 runner dispatches (no informed init)
    t0 = time.perf_counter()
    res2 = sample_batch(model, batch, k_max=4, steps_per_k=12, N=128,
                        informed_init=False, key=jax.random.key(3))
    t_disp = time.perf_counter() - t0
    print(f"runners only (informed off, warm?): {t_disp:.3f}s")
    # warm repeat
    t0 = time.perf_counter()
    res2 = sample_batch(model, batch, k_max=4, steps_per_k=12, N=128,
                        informed_init=False, key=jax.random.key(3))
    t_disp = time.perf_counter() - t0
    print(f"runners only warm: {t_disp:.3f}s")

    # piece 4: pure kernel at the dispatch shape (B*N profiles, one call)
    import jax.numpy as jnp
    profiles = jnp.asarray(rng.integers(0, 2, size=(B * 128, T)), dtype=jnp.int32)
    pr = profiles.reshape(B, 128, T)

    @jax.jit
    def one_sweep(per_traj, pr):
        return jax.vmap(logL_fn)(pr, per_traj)

    np.asarray(one_sweep(per_traj, pr))
    t0 = time.perf_counter()
    for _ in range(5):
        out = one_sweep(per_traj, pr)
    np.asarray(out)
    t_k = (time.perf_counter() - t0) / 5
    evals = B * 128
    print(f"kernel sweep: {t_k*1000:.1f}ms = {evals/t_k:,.0f} evals/s")
    n_sweeps = 5 * 12
    print(f"kernel-only time for the 60-sweep budget: {n_sweeps*t_k:.3f}s")


if __name__ == "__main__":
    main()
