"""
Pallas TPU kernel for the batched multi-state Rouse Kalman likelihood.

Motivation (measured): the XLA `lax.scan` version (`kalman.py`) is
HBM-bandwidth bound — every frame step streams the (P, q, N, N) covariance
carry through HBM several times (~16 MB/step at P=1024, N=20). This kernel
keeps the covariance, mean, and accumulator for a tile of P_TILE profiles
resident in VMEM across the ENTIRE frame loop; per step only the profile
column (int32) and a d-vector observation are touched. The matmuls use the
symmetric-propagation identity

    C' = B C B = B (B C)^T        (C, B symmetric)

so both GEMMs have the batch axis (k, p) in the trailing dims:
``(N, N) x (N, N*P_TILE)`` — lane-dim P_TILE = 128 keeps the VPU/MXU fully
occupied regardless of the (small) monomer count N.

In-kernel layout: profiles arrive time-major ``(T, P)``; covariance scratch
is ``(q, N, N, P_TILE)`` (p in lanes); means ``(N, d, P_TILE)``.

Semantics identical to `kalman.msrouse_logL_batch` (without the optional
re-symmetrization — the B (BC)^T form is self-symmetrizing for exact
arithmetic and empirically stable in f32; parity is tested against the f64
oracle).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_2PI = float(np.log(2.0 * np.pi))

__all__ = ["msrouse_logL_pallas"]

P_TILE = 128
# Always request full-precision MXU passes: 1-pass bf16 matmuls lose ~3
# digits per step in the covariance recursion. (Current Mosaic lowers these
# f32 dots identically regardless of the precision flag — measured equal
# speed AND 1.8e-6 oracle parity under DEFAULT/HIGH/HIGHEST — but HIGHEST
# pins the requirement should that change.)
_KERNEL_PRECISION = jax.lax.Precision.HIGHEST


def _kernel(Bs_ref, Gs_ref, Sigs_ref, M0s_ref, C0s_ref, w_ref, s2_ref,
            profT_ref, ydata_ref, valid_ref, out_ref,
            C_scr, M_scr, acc_scr, *, n, N, d, q, T, Cind):
    fdt = out_ref.dtype

    w_row = w_ref[:]                      # (1, N)

    def masks_for(t):
        prof_t = profT_ref[pl.ds(t, 1), :]          # (1, P) int32
        return [(prof_t == s).astype(fdt) for s in range(n)]

    def bcast_NP(mask):                   # (1, P) -> (N, 1, P) broadcast helper
        return mask[None, :, :]           # (1, 1, P); broadcasts against (N, x, P)

    # ---- t = 0: steady-state init, selected by profile[0] ----------------
    m0 = masks_for(0)
    for qi in range(q):
        C0 = jnp.zeros((N, N, P_TILE), fdt)
        for s in range(n):
            C0 = C0 + C0s_ref[s][:, :, None] * bcast_NP(m0[s])
        C_scr[qi] = C0
    Minit = jnp.zeros((N, d, P_TILE), fdt)
    for s in range(n):
        Minit = Minit + M0s_ref[s][:, :, None] * bcast_NP(m0[s])
    M_scr[:] = Minit
    acc_scr[:] = jnp.zeros((1, P_TILE), fdt)

    # ---- Kalman measurement update (in-place on scratch) -----------------
    def kalman_update(t):
        Ks = []
        Sinvs = []
        for qi in range(q):
            C = C_scr[qi]                                     # (N, N, P)
            Cw = jax.lax.dot_general(
                w_row, C, (((1,), (0,)), ((), ())),
                preferred_element_type=fdt,
                precision=_KERNEL_PRECISION)[0]               # (N, P)
            S = jax.lax.dot_general(
                w_row, Cw, (((1,), (0,)), ((), ())),
                preferred_element_type=fdt,
                precision=_KERNEL_PRECISION) + s2_ref[0, qi]   # (1, P)
            Sinv = 1.0 / S
            K = Cw * Sinv                                     # (N, P)
            C_scr[qi] = C - K[:, None, :] * Cw[None, :, :]
            Ks.append(K)
            Sinvs.append(Sinv)

        M = M_scr[:]                                          # (N, d, P)
        m = jax.lax.dot_general(
            w_row, M, (((1,), (0,)), ((), ())),
            preferred_element_type=fdt,
            precision=_KERNEL_PRECISION)[0]                   # (d, P)
        ll = jnp.zeros((1, P_TILE), fdt)
        M_cols = []
        for dim in range(d):
            y_td = ydata_ref[t, dim]                          # SMEM scalar
            xmm = y_td - m[dim][None, :]                      # (1, P)
            K = Ks[Cind[dim]]
            Sinv = Sinvs[Cind[dim]]
            M_cols.append(M[:, dim, :] + K * xmm[0][None, :])
            ll = ll - 0.5 * (xmm * xmm * Sinv - jnp.log(Sinv) + LOG_2PI)
        M_scr[:] = jnp.stack(M_cols, axis=1)
        acc_scr[:] = acc_scr[:] + ll

    @pl.when(valid_ref[0, 0] != 0)
    def _():
        kalman_update(0)

    # all states' propagators stacked: per-state candidates come out of ONE
    # (n*N, N) x (N, N*P) GEMM instead of n separate ones (measured ~10%
    # end-to-end: fewer MXU invocations and select passes)
    Ball = jnp.concatenate([Bs_ref[s] for s in range(n)], axis=0)  # (n*N, N)

    # ---- frame loop ------------------------------------------------------
    def body(t, _):
        masks = masks_for(t)

        def select_stack(Y):
            """(n*N, x, P) stacked per-state candidates -> per-profile pick."""
            out = Y[0:N] * bcast_NP(masks[0])
            for s in range(1, n):
                out = out + Y[s * N:(s + 1) * N] * bcast_NP(masks[s])
            return out

        # covariance: C' = B (B C)^T + Sig, per unique-error slot
        for qi in range(q):
            C = C_scr[qi]                                     # (N, N, P)
            BC_all = jax.lax.dot_general(
                Ball, C, (((1,), (0,)), ((), ())),
                preferred_element_type=fdt,
                precision=_KERNEL_PRECISION)                  # (n*N, N, P)
            X = select_stack(BC_all)
            Xt = jnp.transpose(X, (1, 0, 2))
            BXt_all = jax.lax.dot_general(
                Ball, Xt, (((1,), (0,)), ((), ())),
                preferred_element_type=fdt,
                precision=_KERNEL_PRECISION)
            Cp = (BXt_all[0:N] + Sigs_ref[0][:, :, None]) * bcast_NP(masks[0])
            for s in range(1, n):
                Cp = Cp + ((BXt_all[s * N:(s + 1) * N] + Sigs_ref[s][:, :, None])
                           * bcast_NP(masks[s]))
            C_scr[qi] = Cp

        # mean: M' = B M + G
        M = M_scr[:]                                          # (N, d, P)
        Mp = jnp.zeros((N, d, P_TILE), fdt)
        for s in range(n):
            BM = jax.lax.dot_general(
                Bs_ref[s], M, (((1,), (0,)), ((), ())),
                preferred_element_type=fdt,
                precision=_KERNEL_PRECISION)
            Mp = Mp + (BM + Gs_ref[s][:, :, None]) * bcast_NP(masks[s])
        M_scr[:] = Mp

        @pl.when(valid_ref[t, 0] != 0)
        def _():
            kalman_update(t)

        return ()

    jax.lax.fori_loop(1, T, body, (), unroll=False)

    out_ref[:] = acc_scr[:]


@functools.partial(jax.jit,
                   static_argnames=("Cind_static", "interpret"))
def _pallas_call(Bs, Gs, Sigs, M0s, C0s, w, s2, profiles, ydata, valid,
                 Cind_static, interpret):
    n, N, _ = Bs.shape
    d = Gs.shape[2]
    fdt = Bs.dtype

    # input prep (inside jit: the wrapper must not dispatch eager device ops)
    profiles = jnp.asarray(profiles, dtype=jnp.int32)
    P_in, T = profiles.shape
    # same contract as kalman.msrouse_logL_batch: out-of-range states -> NaN
    in_range = jnp.all((profiles >= 0) & (profiles < n), axis=1)
    P = -(-P_in // P_TILE) * P_TILE
    if P != P_in:
        profiles = jnp.concatenate(
            [profiles, jnp.broadcast_to(profiles[:1], (P - P_in, T))], axis=0)
    profT = profiles.T
    w = jnp.asarray(w, dtype=fdt)[None, :]
    s2 = jnp.asarray(s2, dtype=fdt)[None, :]
    ydata = jnp.asarray(ydata, dtype=fdt)
    valid_i32 = jnp.asarray(valid).astype(jnp.int32)[:, None]
    q = s2.shape[1]

    kernel = functools.partial(
        _kernel, n=n, N=N, d=d, q=q, T=T, Cind=Cind_static)

    grid = (P // P_TILE,)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, N, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, N, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, N, N), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, P_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            # observations/mask live in VMEM (scalar reads per step): SMEM is
            # ~1 MB and overflows at long T, especially under vmap where the
            # batch dim multiplies the block
            pl.BlockSpec((T, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, P), fdt),
        scratch_shapes=[
            pltpu.VMEM((q, N, N, P_TILE), fdt),
            pltpu.VMEM((N, d, P_TILE), fdt),
            pltpu.VMEM((1, P_TILE), fdt),
        ],
        interpret=interpret,
    )(Bs, Gs, Sigs, M0s, C0s, w, s2, profT, ydata, valid_i32)
    return jnp.where(in_range, out[0, :P_in], jnp.nan)


def msrouse_logL_pallas(Bs, Gs, Sigs, M0s, C0s, w, s2, Cind,
                        profiles, ydata, valid, interpret=False):
    """
    Drop-in equivalent of `kalman.msrouse_logL_batch` backed by the Pallas
    kernel. ``Cind`` may be an array or tuple; it is folded into the kernel
    as static data. The profile batch is padded to a multiple of P_TILE.
    """
    Cind_static = tuple(int(c) for c in np.asarray(Cind))
    return _pallas_call(Bs, Gs, Sigs, M0s, C0s, w, s2,
                        profiles, ydata, valid, Cind_static, interpret)
