"""
Symmetric-packed Pallas TPU kernel for the batched Rouse-Kalman likelihood.

The original kernel (`kalman_pallas.py`) propagates the (N, N) covariance
with two dependent skinny GEMMs per frame (``C' = B (B C)^T``): contraction
dimension N (= monomer count, ~20) occupies < 1/6 of the 128-wide MXU
systolic dimension, and the transpose between the GEMMs serializes them.

This kernel exploits that the covariance is SYMMETRIC: it carries only the
``PP = N(N+1)/2`` unique entries (210 for N=20) and applies the conjugation
``C -> B C B^T`` as ONE dense linear operator on that packed vector,

    c' = P_s c + sig_s,     P_s[(a,b),(i,j)] = B_ai B_bj + [i<j] B_aj B_bi

precomputed per model state on the host (float64, cast to the compute
dtype). The single GEMM has contraction dimension PP ~ 210 — well matched
to the MXU — no transpose, and ~half the select/broadcast VPU traffic of
the dense form.

The Kalman measurement update stays in packed space and costs ONE cheap
MXU dot. With ``Gw (N, PP)`` built from the measurement vector w
(``Cw = Gw c``), the small host-precomputed operator

    U1 = [Gw; w.Gw]                (8-aligned, ~32 rows)

gives ``R1 = U1 c`` — Cw and the innovation variance ``S = w.Cw + s2``
in one contraction-PP dot. The packed rank-1 downdate
``upd[(a,b)] = Cw[a] Cw[b]`` needs NO matmul at all: lexicographic
packing orders the slots by row-index blocks, so for block a the two
factors are a one-sublane broadcast times a contiguous slice,

    upd rows of block a = Cw[a] * Cw[a:N]        (VPU only)

and ``c' = c - upd / S``,  ``K = Cw / S``. Two earlier revisions computed
the downdate rows on the MXU — first as one merged 464-row GEMM folded
into U1, then as a 432-row one-hot selection dot (three exact
bf16-DEFAULT products). The broadcast-slice form beats both: it deletes
~42% of the kernel's MXU row-passes outright (split mode; measured
736k -> 868k evals/s at the bench shape, exact 600k -> 712k), at
oracle parity unchanged on both tiers (2.9e-6 exact / 8.9e-6 split).
Only the S row changes summation grouping vs the reference (~1 ulp).
The predicted measurement mean ``m = w.M'`` is folded into the
mean-propagation GEMM as an extra ``w.B_s`` row per state (blocks padded
to 8 sublanes). Per frame the kernel issues three MXU dots — covariance
propagation, mean propagation, update contraction.

Semantics identical to `kalman.msrouse_logL_batch` (reference algorithm:
``bild/src/MSRouse_logL.pyx:95-256``); parity is tested against the f64
oracle. Out-of-range profile states yield NaN, as in the other kernels.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_2PI = float(np.log(2.0 * np.pi))

__all__ = ["msrouse_logL_pallas_sym", "sym_operators"]

P_TILE = 128
# frames per fori_loop step (manual unroll; `unroll=` on the loop itself
# hits a Mosaic lowering bug on this JAX version)
_SYM_UNROLL = 1
_KERNEL_PRECISION = jax.lax.Precision.HIGHEST

# Split-bf16 matmuls (float32 compute only; opt-in via
# `config.set_rouse_matmul('split')`). On TPU an f32 dot at
# Precision.HIGHEST costs 6 MXU passes; splitting both operands into bf16
# (hi, lo) pairs and summing three DEFAULT-precision products
#   A.B ~ Ahi.Bhi + Ahi.Blo + Alo.Bhi      (f32 accumulation)
# costs 3 passes. The bf16 PAIR carries 16 mantissa bits, so this mode's
# parity floor vs the f64 oracle is ~9e-6 relative (measured; exact mode:
# ~3e-6, the plain f32-storage floor — a 4th lo.lo pass does NOT recover
# it, measured 7.9e-6, which is why no 4-pass mode exists). The split is
# applied to ALL THREE per-frame dots — once the dominant covariance
# conjugation is split, the update contraction and mean-propagation GEMMs
# are the residual MXU work (~30% of row-passes). Measured at the bench
# shape: exact 716k, split 1,000k evals/s (within ~7% of the plain-bf16
# ceiling marker at 5x tighter parity); see DESIGN.md 7g for when that
# trade is right.


def _pack_indices(N):
    """Row/col index per packed slot, ordered (i, j) with i <= j."""
    ia, ja = np.triu_indices(N)
    return ia, ja


def _build_sym_operators(Bs, Gs, Sigs, M0s, C0s, w, pad=8):
    """
    Host-side (numpy, float64) construction of the packed-space operators.

    Returns ``(Pall (n*PPp, PPp), sig_pack (n, PPp), c0_pack (n, PPp),
    U1 (U1Rows, PPp), Ballw (n*N1p, N),
    Gsw (n, N1p, d), M0w (n, N1p, d), PPp, offsets)`` with ``PPp`` = PP
    padded to a multiple of ``pad`` (zero padding is exact: padded slots
    stay 0 through propagation and never enter Cw),
    ``offsets = (S_OFF, N1p)`` the 8-aligned S row of U1 and the per-state
    row stride of the mean propagator.
    """
    Bs = np.asarray(Bs, dtype=np.float64)
    Gs = np.asarray(Gs, dtype=np.float64)
    Sigs = np.asarray(Sigs, dtype=np.float64)
    M0s = np.asarray(M0s, dtype=np.float64)
    C0s = np.asarray(C0s, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    n, N, _ = Bs.shape
    d = Gs.shape[2]
    ia, ja = _pack_indices(N)
    PP = len(ia)
    PPp = -(-PP // pad) * pad

    # P_s: c'[(a,b)] = sum_{i<=j} (B_ai B_bj + [i<j] B_aj B_bi) c[(i,j)]
    off_diag = (ia != ja).astype(np.float64)
    P_ops = np.zeros((n, PPp, PPp))
    for s in range(n):
        B = Bs[s]
        # (PPout, PPin): outer pack over (a,b) pairs, inner over (i,j)
        P_ops[s, :PP, :PP] = (B[ia][:, None, ia] * B[ja][:, None, ja]
                              + (B[ia][:, None, ja] * B[ja][:, None, ia])
                              * off_diag[None, None, :])[:, 0, :]
    Pall = P_ops.reshape(n * PPp, PPp)

    sig_pack = np.zeros((n, PPp))
    c0_pack = np.zeros((n, PPp))
    sig_pack[:, :PP] = Sigs[:, ia, ja]
    c0_pack[:, :PP] = C0s[:, ia, ja]

    Gw = np.zeros((N, PPp))
    for p in range(PP):
        a, b = ia[p], ja[p]
        Gw[a, p] += w[b]
        if a != b:
            Gw[b, p] += w[a]

    # update contraction U1 = [Cw rows; S row]; the packed downdate rows
    # are broadcast-slice products of Cw in the kernel (module docstring)
    S_OFF = -(-N // pad) * pad
    U1Rows = S_OFF + pad
    U1 = np.zeros((U1Rows, PPp))
    U1[:N] = Gw
    U1[S_OFF] = w @ Gw

    # mean propagator with a w.B_s row per state (m = w.M' for free);
    # per-state blocks padded to N1p sublanes for aligned slicing
    N1p = -(-(N + 1) // pad) * pad
    Ballw = np.zeros((n * N1p, N))
    Gsw = np.zeros((n, N1p, d))
    M0w = np.zeros((n, N1p, d))
    for s in range(n):
        Ballw[s * N1p:s * N1p + N] = Bs[s]
        Ballw[s * N1p + N] = w @ Bs[s]
        Gsw[s, :N] = Gs[s]
        Gsw[s, N] = w @ Gs[s]
        M0w[s, :N] = M0s[s]
        M0w[s, N] = w @ M0s[s]
    return (Pall, sig_pack, c0_pack, U1, Ballw, Gsw, M0w, PPp,
            (S_OFF, N1p))


# host-side operator cache: keyed by the byte content of the (small) model
# arrays; bounded (models are few, entries are ~1 MB)
_SYM_OPS_CACHE = {}
_SYM_OPS_CACHE_MAX = 16


def sym_operators(Bs, Gs, Sigs, M0s, C0s, w, dtype):
    key = tuple(np.asarray(x).tobytes()
                for x in (Bs, Gs, Sigs, M0s, C0s, w))
    hit = _SYM_OPS_CACHE.pop(key, None)
    if hit is not None:
        _SYM_OPS_CACHE[key] = hit        # refresh recency
    else:
        while len(_SYM_OPS_CACHE) >= _SYM_OPS_CACHE_MAX:
            _SYM_OPS_CACHE.pop(next(iter(_SYM_OPS_CACHE)))
        hit = _build_sym_operators(Bs, Gs, Sigs, M0s, C0s, w)
        _SYM_OPS_CACHE[key] = hit
    *ops, PPp, offs = hit
    # ops = [Pall, sig_pack, c0_pack, U1, Ballw, Gsw, M0w]
    return [jnp.asarray(o, dtype=dtype) for o in ops], PPp, offs


def _kernel(Pall_ref, sig_ref, c0_ref, U1_ref, Ballw_ref, Gsw_ref,
            M0w_ref, s2_ref, profT_ref, ydata_ref, valid_ref, out_ref,
            c_scr, M_scr, acc_scr, *, n, N, d, q, T, PPp, offs, Cind,
            split_bf16=False, split_update=True, unroll=_SYM_UNROLL,
            p_tile=P_TILE):
    fdt = out_ref.dtype
    S_OFF, N1p = offs

    def masks_for(t):
        prof_t = profT_ref[pl.ds(t, 1), :]          # (1, P) int32
        return [(prof_t == s).astype(fdt) for s in range(n)]

    def bcast(mask):                      # (1, P) -> broadcastable (1, 1, P)
        return mask[None, :, :]

    # ---- t = 0: steady-state init, selected by profile[0] ----------------
    m0 = masks_for(0)
    c_init = jnp.zeros((PPp, p_tile), fdt)
    for s in range(n):
        c_init = c_init + c0_ref[s][:, None] * m0[s]
    for qi in range(q):
        c_scr[qi] = c_init
    Minit = jnp.zeros((N1p, d, p_tile), fdt)
    for s in range(n):
        Minit = Minit + M0w_ref[s][:, :, None] * bcast(m0[s])
    M_scr[:] = Minit
    acc_scr[:] = jnp.zeros((1, p_tile), fdt)

    # split-bf16 operands for ALL three per-frame dots (3 MXU passes each
    # instead of HIGHEST's 6; see module comment). The covariance
    # conjugation dominates, but at split tier the mean propagation and the
    # update contraction are the residual MXU work (~30% of row-passes), so
    # the same (hi, lo) decomposition is applied to their static operands.
    split = split_bf16 and fdt == jnp.float32
    split_upd = split and split_update
    if split:
        def hi_lo(a):
            a_hi = a.astype(jnp.bfloat16)
            return a_hi, (a - a_hi.astype(fdt)).astype(jnp.bfloat16)

        Pall_hi, Pall_lo = hi_lo(Pall_ref[:])
        if split_upd:
            U1_hi, U1_lo = hi_lo(U1_ref[:])
            Ballw_hi, Ballw_lo = hi_lo(Ballw_ref[:])

    def split_dot(a_hi, a_lo, b, dn):
        """3-product split-bf16 f32 dot (b split on the fly)."""
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(fdt)).astype(jnp.bfloat16)

        def dot(x, y):
            return jax.lax.dot_general(x, y, dn, preferred_element_type=fdt)

        return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)

    def prop_dot(c):
        """(n*PPp, PPp) x (PPp, P) covariance-conjugation product."""
        dn = (((1,), (0,)), ((), ()))
        if not split:
            return jax.lax.dot_general(Pall_ref[:], c, dn,
                                       preferred_element_type=fdt,
                                       precision=_KERNEL_PRECISION)
        return split_dot(Pall_hi, Pall_lo, c, dn)

    # ---- Kalman measurement update (one contraction dot + VPU downdate) --
    def packed_downdate(Cw):
        """VPU form of the packed downdate ``upd[p] = Cw[ia[p]] Cw[ja[p]]``.

        Lexicographic packing makes both factors contiguous per block:
        for row-index block i the downdate rows are
        ``Cw[i] * Cw[i:N]`` — a sublane broadcast times a sublane slice.
        Zero MXU passes; oracle parity identical to the MXU selection
        forms it replaced (module docstring).
        """
        blocks = [Cw[i:i + 1] * Cw[i:N] for i in range(N)]
        if PPp > N * (N + 1) // 2:
            blocks.append(jnp.zeros((PPp - N * (N + 1) // 2, p_tile), fdt))
        return jnp.concatenate(blocks, axis=0)                # (PPp, P)

    def kalman_update(t):
        Ks = []
        Sinvs = []
        dn_u = (((1,), (0,)), ((), ()))
        for qi in range(q):
            c = c_scr[qi]                                     # (PPp, P)
            R1 = (split_dot(U1_hi, U1_lo, c, dn_u) if split_upd
                  else jax.lax.dot_general(
                      U1_ref[:], c, dn_u,
                      preferred_element_type=fdt,
                      precision=_KERNEL_PRECISION))           # (U1Rows, P)
            S = R1[S_OFF:S_OFF + 1] + s2_ref[0, qi]           # (1, P)
            Sinv = 1.0 / S
            K = R1[:N] * Sinv                                 # (N, P)
            upd = packed_downdate(R1[:N])                     # (PPp, P)
            c_scr[qi] = c - upd * Sinv
            Ks.append(K)
            Sinvs.append(Sinv)

        M = M_scr[:]                                          # (N1p, d, P)
        m = M[N]                                              # (d, P)
        ll = jnp.zeros((1, p_tile), fdt)
        M_cols = []
        for dim in range(d):
            y_td = ydata_ref[t, dim]
            xmm = y_td - m[dim][None, :]                      # (1, P)
            K = Ks[Cind[dim]]
            Sinv = Sinvs[Cind[dim]]
            M_cols.append(M[:N, dim, :] + K * xmm[0][None, :])
            ll = ll - 0.5 * (xmm * xmm * Sinv - jnp.log(Sinv) + LOG_2PI)
        M_upd = jnp.stack(M_cols, axis=1)                     # (N, d, P)
        M_scr[:] = jnp.concatenate([M_upd, M[N:]], axis=0)
        acc_scr[:] = acc_scr[:] + ll

    @pl.when(valid_ref[0, 0] != 0)
    def _():
        kalman_update(0)

    # ---- frame loop ------------------------------------------------------
    def frame(t):
        masks = masks_for(t)

        # packed covariance: c' = P_s c + sig_s, all states in ONE GEMM
        for qi in range(q):
            c = c_scr[qi]                                     # (PPp, P)
            Pc_all = prop_dot(c)                              # (n*PPp, P)
            cp = ((Pc_all[0:PPp] + sig_ref[0][:, None]) * masks[0])
            for s in range(1, n):
                cp = cp + ((Pc_all[s * PPp:(s + 1) * PPp]
                            + sig_ref[s][:, None]) * masks[s])
            c_scr[qi] = cp

        # mean + measurement mean: M' = B M + G with the w.B_s row riding
        # along per state — all states in ONE GEMM
        M = M_scr[:]                                          # (N1p, d, P)
        dn_m = (((1,), (0,)), ((), ()))
        BM_all = (split_dot(Ballw_hi, Ballw_lo, M[:N], dn_m) if split_upd
                  else jax.lax.dot_general(
                      Ballw_ref[:], M[:N], dn_m,
                      preferred_element_type=fdt,
                      precision=_KERNEL_PRECISION))           # (n*N1p, d, P)
        Mp = ((BM_all[0:N1p] + Gsw_ref[0][:, :, None]) * bcast(masks[0]))
        for s in range(1, n):
            Mp = Mp + ((BM_all[s * N1p:(s + 1) * N1p]
                        + Gsw_ref[s][:, :, None]) * bcast(masks[s]))
        M_scr[:] = Mp

        @pl.when(valid_ref[t, 0] != 0)
        def _():
            kalman_update(t)

    nrem = (T - 1) % unroll
    for t in range(1, 1 + nrem):
        frame(t)

    def body(j, _):
        t0 = 1 + nrem + j * unroll
        for i in range(unroll):
            frame(t0 + i)
        return ()

    jax.lax.fori_loop(0, (T - 1 - nrem) // unroll, body, (), unroll=False)

    out_ref[:] = acc_scr[:]


@functools.partial(jax.jit,
                   static_argnames=("PPp", "offs", "Cind_static", "interpret",
                                    "split_bf16", "split_update", "unroll",
                                    "p_tile"))
def _pallas_call_sym(Pall, sig_pack, c0_pack, U1, Ballw, Gsw, M0w,
                     s2, profiles, ydata, valid,
                     PPp, offs, Cind_static, interpret,
                     split_bf16=False, split_update=True,
                     unroll=_SYM_UNROLL, p_tile=P_TILE):
    n = sig_pack.shape[0]
    N = Ballw.shape[1]
    d = Gsw.shape[2]
    fdt = Pall.dtype
    N1p = offs[1]
    U1Rows = U1.shape[0]

    profiles = jnp.asarray(profiles, dtype=jnp.int32)
    P_in, T = profiles.shape
    in_range = jnp.all((profiles >= 0) & (profiles < n), axis=1)
    P = -(-P_in // p_tile) * p_tile
    if P != P_in:
        profiles = jnp.concatenate(
            [profiles, jnp.broadcast_to(profiles[:1], (P - P_in, T))], axis=0)
    profT = profiles.T
    s2 = jnp.asarray(s2, dtype=fdt)[None, :]
    ydata = jnp.asarray(ydata, dtype=fdt)
    valid_i32 = jnp.asarray(valid).astype(jnp.int32)[:, None]
    q = s2.shape[1]

    kernel = functools.partial(
        _kernel, n=n, N=N, d=d, q=q, T=T, PPp=PPp, offs=offs,
        Cind=Cind_static, split_bf16=split_bf16, split_update=split_update,
        unroll=unroll, p_tile=p_tile)

    grid = (P // p_tile,)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n * PPp, PPp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, PPp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, PPp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U1Rows, PPp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n * N1p, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, N1p, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, N1p, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, p_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, P), fdt),
        scratch_shapes=[
            pltpu.VMEM((q, PPp, p_tile), fdt),
            pltpu.VMEM((N1p, d, p_tile), fdt),
            pltpu.VMEM((1, p_tile), fdt),
        ],
        interpret=interpret,
    )(Pall, sig_pack, c0_pack, U1, Ballw, Gsw, M0w, s2,
      profT, ydata, valid_i32)
    return jnp.where(in_range, out[0, :P_in], jnp.nan)


def _sym_vmem_bytes(n, N, d, q, PPp, itemsize=4):
    """Rough VMEM footprint of the sym kernel: the packed conjugation
    operator dominates (n * PPp^2), plus the update contraction operator,
    per-q scratch and the P_TILE-wide buffers."""
    u1rows = -(-N // 8) * 8 + 8
    n1p = -(-(N + 1) // 8) * 8
    operands = (n * PPp * PPp + 2 * n * PPp + u1rows * PPp
                + n * n1p * (N + 2 * d))
    scratch = (q * PPp + n1p * d + 1) * P_TILE
    return (operands + scratch) * itemsize


# Fall back to the dense kernel above this packed-operator footprint: the
# ~16 MB/core VMEM budget must also hold Pallas pipeline buffers. The dense
# kernel's VMEM scales as q*N^2*P_TILE (scratch) + n*N^2 (operands), far
# below this crossover for any N where sym overflows (N >= ~40 at n=2).
_SYM_VMEM_LIMIT = 12 * 2**20


def msrouse_logL_pallas_sym(Bs, Gs, Sigs, M0s, C0s, w, s2, Cind,
                            profiles, ydata, valid, interpret=False,
                            unroll=_SYM_UNROLL, p_tile=P_TILE,
                            matmul=None):
    """
    Drop-in equivalent of `kalman.msrouse_logL_batch` backed by the
    symmetric-packed Pallas kernel. Requires CONCRETE (non-traced) model
    arrays — the packed operators are precomputed on host (f64) and cached;
    model arrays are module-level constants in every caller.

    ``matmul`` selects the f32 dot tier: ``'exact'`` (HIGHEST-precision, the
    parity tier), ``'split'`` (all three per-frame dots as 3-pass split-bf16,
    the dataset-throughput tier), or ``'split_cov'`` (split the dominant
    covariance conjugation only, keep the update contraction and mean
    propagation exact — the intermediate tier). ``None`` (default) resolves
    from `bild_tpu.config.rouse_matmul` in the ``'single'`` context, so a
    config of ``'auto'`` means ``'exact'`` here; the lockstep dataset path
    resolves its own context (see ``config.resolve_matmul``).

    Large Rouse chains (the packed conjugation operators are
    ``n * (N(N+1)/2)^2`` floats; ~13 MB at n=2, N=50) would exhaust VMEM,
    so those shapes automatically fall back to the dense Pallas kernel
    (`kalman_pallas`), which they fit.
    """
    # Shape-only probes: jnp.asarray keeps traced args (e.g. a perturbed s2
    # inside a timing fori_loop) abstract instead of forcing materialization.
    n, N = np.asarray(Bs).shape[:2]          # model constants, concrete
    d = np.asarray(Gs).shape[2]
    q = jnp.asarray(s2).shape[0]
    PP = N * (N + 1) // 2
    PPp = -(-PP // 8) * 8
    if _sym_vmem_bytes(n, N, d, q, PPp) > _SYM_VMEM_LIMIT:
        from .kalman_pallas import msrouse_logL_pallas
        return msrouse_logL_pallas(Bs, Gs, Sigs, M0s, C0s, w, s2, Cind,
                                   profiles, ydata, valid,
                                   interpret=interpret)
    Cind_static = tuple(int(c) for c in np.asarray(Cind))
    (Pall, sig_pack, c0_pack, U1, Ballw, Gsw, M0w), PPp, offs = \
        sym_operators(Bs, Gs, Sigs, M0s, C0s, w, jnp.asarray(Bs).dtype)
    if matmul is None:
        from ..config import resolve_matmul
        matmul = resolve_matmul("single")
    if matmul not in ("exact", "split", "split_cov"):
        raise ValueError(f"matmul must be 'exact'|'split'|'split_cov', "
                         f"got {matmul!r}")
    return _pallas_call_sym(Pall, sig_pack, c0_pack, U1, Ballw, Gsw,
                            M0w, s2, profiles, ydata, valid,
                            PPp, offs, Cind_static, interpret,
                            split_bf16=(matmul != "exact"),
                            split_update=(matmul == "split"),
                            unroll=unroll, p_tile=p_tile)
