"""Scratch: which part of amis_update costs 40ms/step at lockstep shape?"""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bild_tpu.amis.cfc import cfc_estimate, cfc_logpmf
    from bild_tpu.amis.dirichlet import dirichlet_estimate, dirichlet_logpdf
    from bild_tpu.amis.sampler import _log_proposal
    from bild_tpu.models import MultiStateRouse

    B, N, S, K1, n = 128, 128, 12, 5, 2
    model = MultiStateRouse(20, 1.0, 5.0, d=3, localization_error=0.1)
    transitions = jnp.asarray(model.transitions)
    active = jnp.arange(K1) < 4

    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    ss = jnp.asarray(rng.dirichlet(np.ones(K1), size=(B, S * N)), jnp.float32)
    thetas = jnp.asarray(rng.integers(0, n, size=(B, S * N, K1)), jnp.int32)
    lw = jnp.asarray(rng.normal(size=(B, S * N)), jnp.float32)
    a = jnp.ones((B, K1), jnp.float32)
    logp = jnp.full((B, n, K1), -np.log(n), jnp.float32)

    def bench(name, fn, *args):
        f = jax.jit(fn)
        r = f(*args); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt*1000:.2f} ms")

    bench("dirichlet_logpdf (B x S*N)",
          jax.vmap(lambda a, s: dirichlet_logpdf(a, s, active=active)), a, ss)
    bench("cfc_logpmf (B x S*N)",
          jax.vmap(lambda lp, th: cfc_logpmf(lp, th, transitions, active=active)),
          logp, thetas)
    bench("_log_proposal (B x S*N)",
          jax.vmap(lambda a, lp, s, th: _log_proposal(a, lp, s, th, transitions,
                                                      active=active)),
          a, logp, ss, thetas)

    # vmap over S+1 proposals too (the new-block mixture delta)
    aS = jnp.ones((B, S + 1, K1), jnp.float32)
    logpS = jnp.full((B, S + 1, n, K1), -np.log(n), jnp.float32)
    ssN = ss[:, :N]
    thN = thetas[:, :N]
    bench("_log_proposal (B x S+1 x N)",
          jax.vmap(lambda aS, lpS, s, th: jax.vmap(
              lambda a_j, lp_j: _log_proposal(a_j, lp_j, s, th, transitions,
                                              active=active))(aS, lpS)),
          aS, logpS, ssN, thN)

    bench("dirichlet_estimate (B x S*N)",
          jax.vmap(lambda s, w: dirichlet_estimate(s, w, active=active)), ss, lw)
    bench("cfc_estimate (B x S*N)",
          jax.vmap(lambda th, w: cfc_estimate(th, w, transitions, n,
                                              active=active)[0]), thetas, lw)


if __name__ == "__main__":
    main()
