"""Symmetric-packed Pallas kernel (`ops/kalman_sym.py`) parity, interpret
mode on CPU, vs the XLA scan kernel — and operator-construction sanity."""
import numpy as np
import jax.numpy as jnp

from bild_tpu import Trajectory
from bild_tpu.models import MultiStateRouse
from bild_tpu.ops.kalman import msrouse_logL_batch
from bild_tpu.ops.kalman_sym import (msrouse_logL_pallas_sym,
                                     _build_sym_operators)


def _case(rng, N=12, d=3, T=40, P=70, locerr=(0.1, 0.2, 0.1), missing=(0, 5, 17),
          looppositions=(None, (0, -1))):
    model = MultiStateRouse(N, 1.0, 4.0, d=d, localization_error=list(locerr),
                            looppositions=looppositions)
    data = rng.normal(size=(T, d))
    for t in missing:
        data[t] = np.nan
    traj = Trajectory.create(data)
    profiles = rng.integers(0, model.nStates, size=(P, T)).astype(np.int32)
    s2, Cind = model._noise_arrays(traj)
    args = (model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s,
            model.w, s2, Cind, jnp.asarray(profiles), traj.data, traj.valid)
    return args


def test_sym_interpret_parity(rng):
    args = _case(rng)
    want = np.asarray(msrouse_logL_batch(*args))
    got = np.asarray(msrouse_logL_pallas_sym(*args, interpret=True))
    # x64 in tests: the packed reformulation is algebraically exact
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_sym_interpret_parity_three_states(rng):
    """The config-4 workload shape (3 Rouse states: free, full loop, half
    loop) through the packed-update kernel — per-state operator stacking
    and the packed downdate must hold beyond n=2."""
    args = _case(rng, N=10, T=30, P=40,
                 looppositions=(None, (0, -1), (0, 4)))
    want = np.asarray(msrouse_logL_batch(*args))
    got = np.asarray(msrouse_logL_pallas_sym(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_sym_interpret_parity_padding(rng):
    args = _case(rng, P=3, T=12, missing=())
    want = np.asarray(msrouse_logL_batch(*args))
    got = np.asarray(msrouse_logL_pallas_sym(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_sym_out_of_range_states_yield_nan(rng):
    model = MultiStateRouse(8, 1, 5, d=1, localization_error=0.5)
    traj = Trajectory.create(np.linspace(0.0, 1.0, 5))
    s2, Cind = model._noise_arrays(traj)
    profiles = np.array([[0, 1, 1, 0, 1],
                         [0, 1, 2, 0, 1]])
    got = np.asarray(msrouse_logL_pallas_sym(
        model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s,
        model.w, s2, Cind, profiles, traj.data, traj.valid, interpret=True))
    assert np.isfinite(got[0]) and np.isnan(got[1])


def test_packed_operator_matches_dense_conjugation(rng):
    """P_s c == pack(B C B^T) for random symmetric C, and the update
    contraction operator + broadcast-slice downdate recover Cw, S, and
    the rank-1 factors."""
    model = MultiStateRouse(9, 1.0, 4.0, d=1, localization_error=0.2)
    (Pall, sig, c0, U1, Ballw, Gsw, M0w, PPp,
     (S_OFF, N1p)) = _build_sym_operators(
        model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s, model.w)
    n, N, _ = np.asarray(model.Bs).shape
    w = np.asarray(model.w)
    ia, ja = np.triu_indices(N)
    A = rng.normal(size=(N, N))
    C = A @ A.T
    c = np.zeros(PPp)
    c[: len(ia)] = C[ia, ja]
    B = np.asarray(model.Bs, dtype=np.float64)
    for s in range(n):
        want = (B[s] @ C @ B[s].T)[ia, ja]
        got = (Pall[s * PPp:(s + 1) * PPp] @ c)[: len(ia)]
        np.testing.assert_allclose(got, want, rtol=1e-10)
    # update operator: contraction R1 = U1 c gives Cw and the S row
    R1 = U1 @ c
    Cw = C @ w
    np.testing.assert_allclose(R1[:N], Cw, rtol=1e-10)         # Gw c == C w
    np.testing.assert_allclose(R1[S_OFF], w @ Cw, rtol=1e-10)  # S row
    # broadcast-slice downdate identity: lexicographic triu packing makes
    # the rank-1 rows Cw[ia]*Cw[ja] == concat_i(Cw[i] * Cw[i:N]) — the
    # kernel's zero-MXU form (packed_downdate)
    upd_blocks = np.concatenate([Cw[i] * Cw[i:N] for i in range(N)])
    np.testing.assert_array_equal(upd_blocks, Cw[ia] * Cw[ja])
    # mean propagator carries w.B_s as row N of each state block
    for s in range(n):
        np.testing.assert_allclose(Ballw[s * N1p + N], w @ B[s], rtol=1e-12)


def test_rouse_matmul_knob(rng):
    """The split-bf16 mode is validated and inert under x64 (it requires
    float32 compute, so the CPU test path must stay exact). The shipped
    default is 'auto': split on the lockstep dataset path, exact for
    single-trajectory/validation dispatches."""
    import pytest
    from bild_tpu import config

    assert config.rouse_matmul() == "auto"
    assert config.resolve_matmul("lockstep") == "split"
    assert config.resolve_matmul("single") == "exact"
    # length gate: split's compounding error (0.085 nats at T=100, 4.5 at
    # T=1000, PARITY_LADDER_r05.json) caps 'auto' split at SPLIT_MAX_T
    assert config.resolve_matmul("lockstep", T=config.SPLIT_MAX_T) == "split"
    assert config.resolve_matmul("lockstep",
                                 T=config.SPLIT_MAX_T + 1) == "exact"
    assert config.resolve_matmul("single", T=50) == "exact"
    with pytest.raises(ValueError, match="rouse_matmul"):
        config.set_rouse_matmul("bf16")
    with pytest.raises(ValueError, match="context"):
        config.resolve_matmul("dataset")
    args = _case(rng, N=8, T=12, P=3, missing=())
    want = np.asarray(msrouse_logL_pallas_sym(*args, interpret=True))
    try:
        config.set_rouse_matmul("split")
        assert config.resolve_matmul("single") == "split"
        # x64 compute: the split branch is skipped, results stay exact
        got = np.asarray(msrouse_logL_pallas_sym(*args, interpret=True))
    finally:
        config.set_rouse_matmul("auto")
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_rouse_matmul_split_f32_numerics(rng):
    """Numeric parity of the split-bf16 mode where it is actually ACTIVE
    (float32 operands, interpret mode): all three per-frame dots run the
    3-product (hi, lo) decomposition, which floors at ~2^-17 relative —
    well inside 2e-4 of the x64 oracle over T=40 accumulated frames (the
    TPU drive measures ~7e-5 on the standard case)."""
    from bild_tpu import config

    args = _case(rng)
    want = np.asarray(msrouse_logL_batch(*args))          # x64 oracle
    args32 = tuple(jnp.asarray(a, jnp.float32)
                   if jnp.asarray(a).dtype == jnp.float64 else a
                   for a in args)
    exact32 = np.asarray(msrouse_logL_pallas_sym(*args32, interpret=True))
    try:
        config.set_rouse_matmul("split")
        split32 = np.asarray(msrouse_logL_pallas_sym(*args32, interpret=True))
        config.set_rouse_matmul("split_cov")
        splitcov32 = np.asarray(msrouse_logL_pallas_sym(*args32,
                                                        interpret=True))
    finally:
        config.set_rouse_matmul("auto")
    assert not np.array_equal(split32, exact32), \
        "split mode was inert on f32 operands"
    assert not np.array_equal(splitcov32, exact32), \
        "split_cov mode was inert on f32 operands"
    # split_cov keeps the update contraction exact: distinct from full split
    assert not np.array_equal(splitcov32, split32)
    np.testing.assert_allclose(exact32, want, rtol=5e-5)
    np.testing.assert_allclose(split32, want, rtol=2e-4)
    np.testing.assert_allclose(splitcov32, want, rtol=2e-4)
    # the explicit matmul argument overrides config (config is 'auto' here,
    # which resolves to 'exact' for direct calls)
    via_arg = np.asarray(msrouse_logL_pallas_sym(*args32, interpret=True,
                                                 matmul="split"))
    np.testing.assert_array_equal(via_arg, split32)


def test_sym_unroll_and_p_tile_parity(rng):
    """The hardware-sweep knobs (manual frame unroll, profile tile width)
    must not change values: the unroll remainder path (T-1 not divisible
    by `unroll`) and non-default tiles hit the same per-frame math."""
    args = _case(rng, N=8, T=14, P=5, missing=(3,))   # (T-1)=13: remainder
    want = np.asarray(msrouse_logL_pallas_sym(*args, interpret=True))
    for kw in ({"unroll": 2}, {"unroll": 4}, {"p_tile": 256},
               {"unroll": 3, "p_tile": 256}):
        got = np.asarray(msrouse_logL_pallas_sym(*args, interpret=True, **kw))
        np.testing.assert_allclose(got, want, rtol=1e-9, err_msg=str(kw))


def test_sym_large_N_falls_back_to_dense(rng, monkeypatch):
    """Chains whose packed operators exceed the VMEM budget must route to
    the dense Pallas kernel automatically (same values, no overflow)."""
    import bild_tpu.ops.kalman_sym as ks

    args = _case(rng, N=10, d=1, T=10, P=3, locerr=(0.2,), missing=())
    want = np.asarray(msrouse_logL_pallas_sym(*args, interpret=True))

    calls = {}
    from bild_tpu.ops.kalman_pallas import msrouse_logL_pallas as dense

    def spy(*a, **kw):
        calls["dense"] = True
        return dense(*a, **kw)

    import bild_tpu.ops.kalman_pallas as kp
    monkeypatch.setattr(kp, "msrouse_logL_pallas", spy)
    # shrink the budget so N=10 overflows it
    monkeypatch.setattr(ks, "_SYM_VMEM_LIMIT", 1024)
    got = np.asarray(msrouse_logL_pallas_sym(*args, interpret=True))
    assert calls.get("dense"), "dense fallback was not taken"
    np.testing.assert_allclose(got, want, rtol=1e-9)
