"""Scratch: time the AMIS propose/update machinery at lockstep shape."""
import time
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bild_tpu.amis.cfc import CFC
    from bild_tpu.amis.sampler import AmisState, amis_propose, amis_update
    from bild_tpu.models import MultiStateRouse

    B, N, T, S, K1 = 128, 128, 100, 12, 5
    k = 3
    model = MultiStateRouse(20, 1.0, 5.0, d=3, localization_error=0.1)
    cfc = CFC(model.transitions)
    transitions = jnp.asarray(model.transitions)
    n = cfc.n
    import math
    a0 = jnp.ones(K1)
    logp0 = jnp.full((n, K1), -math.log(n))
    active = jnp.arange(K1) < (k + 1)
    logprior = jnp.asarray(0.0)

    states = jax.vmap(lambda _: AmisState.create(S, N, K1 - 1, n, a0, logp0))(
        jnp.arange(B))
    keys = jax.random.split(jax.random.key(0), B)

    # propose only, S steps
    @jax.jit
    def propose_loop(states, keys):
        def body(i, carry):
            states, keys = carry
            def one(state, key):
                key, sub = jax.random.split(key)
                ss, th, profiles = amis_propose(state, sub, transitions,
                                                N=N, T=T, active=active)
                return state, key, profiles.sum()
            states, keys, s = jax.vmap(one)(states, keys)
            return states, keys
        return jax.lax.fori_loop(0, S, body, (states, keys))

    r = propose_loop(states, keys); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = propose_loop(states, keys); jax.block_until_ready(r)
    t_prop = time.perf_counter() - t0
    print(f"propose x{S}: {t_prop:.3f}s ({t_prop/S*1000:.1f} ms/step)")

    # propose + update (dummy logL), S steps
    @jax.jit
    def step_loop(states, keys):
        def body(i, carry):
            states, keys = carry
            def one(state, key):
                key, sub = jax.random.split(key)
                ss, th, profiles = amis_propose(state, sub, transitions,
                                                N=N, T=T, active=active)
                logLs = -jnp.sum(profiles.astype(jnp.float32), axis=1)
                state, _ = amis_update(state, ss, th, logLs, transitions,
                                       logprior, jnp.asarray(1.28),
                                       jnp.asarray(0.128), active=active)
                return state, key
            states, keys = jax.vmap(one)(states, keys)
            return states, keys
        return jax.lax.fori_loop(0, S, body, (states, keys))

    r = step_loop(states, keys); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = step_loop(states, keys); jax.block_until_ready(r)
    t_step = time.perf_counter() - t0
    print(f"propose+update x{S}: {t_step:.3f}s ({t_step/S*1000:.1f} ms/step)")
    print(f"update alone: ~{(t_step-t_prop)/S*1000:.1f} ms/step")
    print(f"for config3 budget (5 k x 12 steps): propose+update = "
          f"{5*t_step:.2f}s")


if __name__ == "__main__":
    main()
