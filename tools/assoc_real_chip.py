"""
Associative-kernel value check on REAL silicon (VERDICT r4 weak #5).

The r4 crossover grid ran on a virtual CPU mesh; this measures the one
configuration the associative formulation should like best on the real
chip: P=1 (a single profile — boundary-postproc-style scoring), very long
T, single chip — where the sequential kernel leaves the chip's parallelism
idle and the associative scan can use T-way parallelism.

Usage: python tools/assoc_real_chip.py [--T 16384,65536,262144]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", default="16384,65536,262144")
    ap.add_argument("--out", default="ASSOC_REALCHIP.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bild_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from bild_tpu.models import MultiStateRouse
    from bild_tpu.ops.kalman import msrouse_logL_batch
    from bild_tpu.ops.assoc_kalman import msrouse_logL_assoc

    rows = []
    for T in (int(x) for x in args.T.split(",")):
        model = MultiStateRouse(20, 1.0, 5.0, d=3, localization_error=0.1)
        rng = np.random.default_rng(1)
        prof = np.zeros(T, dtype=int)
        prof[T // 3: 2 * T // 3] = 1
        # synthetic observations (content is irrelevant to timing)
        y = jnp.asarray(rng.normal(size=(T, 3)), dtype=model.Bs.dtype)
        valid = jnp.ones(T, dtype=bool)
        s2 = jnp.asarray([0.01], dtype=model.Bs.dtype)
        Cind = jnp.zeros(3, dtype=jnp.int32)
        args_k = (model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s,
                  model.w, s2, Cind)
        prof_b = jnp.asarray(prof[None], dtype=jnp.int32)
        prof_1 = jnp.asarray(prof, dtype=jnp.int32)

        def time_fn(fn, *fargs):
            out = jax.block_until_ready(fn(*fargs))
            t0 = time.perf_counter()
            for _ in range(3):
                out = jax.block_until_ready(fn(*fargs))
            return (time.perf_counter() - t0) / 3, np.asarray(out)

        seq_s, v_seq = time_fn(msrouse_logL_batch, *args_k, prof_b, y, valid)
        assoc_s, v_as = time_fn(msrouse_logL_assoc, *args_k, prof_1, y, valid)
        rel = float(abs((v_as - v_seq[0]) / v_seq[0]))
        row = {"T": T, "P": 1, "seq_ms": round(seq_s * 1e3, 1),
               "assoc_ms": round(assoc_s * 1e3, 1),
               "speedup_assoc_over_seq": round(seq_s / assoc_s, 3),
               "rel_diff": rel}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
