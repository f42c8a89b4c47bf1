"""Pallas kernel parity (interpret mode on CPU) vs the XLA scan kernel and
the float64 oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from bild_tpu import Trajectory
from bild_tpu.models import MultiStateRouse
from bild_tpu.ops.kalman import msrouse_logL_batch
from bild_tpu.ops.kalman_pallas import msrouse_logL_pallas


def _case(rng, N=12, d=3, T=40, P=70, locerr=(0.1, 0.2, 0.1), missing=(0, 5, 17)):
    model = MultiStateRouse(N, 1.0, 4.0, d=d, localization_error=list(locerr))
    data = rng.normal(size=(T, d))
    for t in missing:
        data[t] = np.nan
    traj = Trajectory.create(data)
    profiles = rng.integers(0, 2, size=(P, T)).astype(np.int32)
    s2, Cind = model._noise_arrays(traj)
    args = (model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s,
            model.w, s2, Cind, jnp.asarray(profiles), traj.data, traj.valid)
    return args


def test_pallas_interpret_parity(rng):
    args = _case(rng)
    want = np.asarray(msrouse_logL_batch(*args))
    got = np.asarray(msrouse_logL_pallas(*args, interpret=True))
    # x64 is enabled in tests: both paths run f64; agreement should be tight
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_pallas_interpret_parity_padding(rng):
    # P not a multiple of the 128-lane tile exercises the pad/slice path
    args = _case(rng, P=3, T=12, missing=())
    want = np.asarray(msrouse_logL_batch(*args))
    got = np.asarray(msrouse_logL_pallas(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_pallas_out_of_range_states_yield_nan(rng):
    from bild_tpu.models import MultiStateRouse
    from bild_tpu.trajectory import Trajectory
    model = MultiStateRouse(8, 1, 5, d=1, localization_error=0.5)
    traj = Trajectory.create(np.linspace(0.0, 1.0, 5))
    s2, Cind = model._noise_arrays(traj)
    profiles = np.array([[0, 1, 1, 0, 1],
                         [0, 1, 2, 0, 1]])
    got = np.asarray(msrouse_logL_pallas(
        model.Bs, model.Gs, model.Sigs, model.M0s, model.C0s,
        model.w, s2, Cind, profiles, traj.data, traj.valid, interpret=True))
    assert np.isfinite(got[0]) and np.isnan(got[1])
