"""
Global configuration helpers for bild_tpu.

The framework is dtype-polymorphic: on TPU we default to float32 (with
``jax.lax.Precision.HIGHEST`` matmuls so the MXU runs full-precision passes);
for CPU-oracle parity testing the test-suite enables float64 via
``jax.config.update('jax_enable_x64', True)`` and everything follows along.
"""
from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["fdtype", "idtype", "MATMUL_PRECISION",
           "rouse_kernel", "set_rouse_kernel",
           "rouse_matmul", "set_rouse_matmul", "resolve_matmul",
           "enable_compilation_cache"]

# Precision for the small dense matmuls in the Kalman recursion. These are
# numerically load-bearing (covariance propagation); bf16 passes are not
# acceptable, so always request the full-precision MXU mode.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST

# Which Rouse-Kalman kernel the models dispatch to on TPU float32:
#   "sym"   — symmetric-packed Pallas kernel (fastest; f32 parity vs the
#             f64 oracle ~2.6e-6 at T=100)
#   "dense" — dense Pallas kernel (~0.76x throughput; parity ~1.7e-6)
#   "xla"   — lax.scan kernel (slowest; the CPU/f64 reference path)
# (On CPU or under x64 the XLA kernel is always used.)
_ROUSE_KERNEL = "sym"


def rouse_kernel() -> str:
    return _ROUSE_KERNEL


def set_rouse_kernel(name: str) -> None:
    """Select the TPU float32 Rouse-Kalman kernel: 'sym' (default, fastest),
    'dense' (tighter f32 parity), or 'xla'. Affects subsequent model
    dispatches; compiled programs for the previous choice stay cached."""
    global _ROUSE_KERNEL
    if name not in ("sym", "dense", "xla"):
        raise ValueError(f"unknown kernel {name!r}; use 'sym'|'dense'|'xla'")
    _ROUSE_KERNEL = name


# Rouse-kernel matmul mode (float32 TPU compute only):
#   'auto' (default) — context-resolved: 'split' on the lockstep dataset
#       path (`sample_batch`/`sample_dataset`), 'exact' everywhere else
#       (single-trajectory adaptive mode, direct `logL_batch` calls,
#       parity validation). Rationale: at the 10k-trajectory benchmark the
#       split tier is +32% end-to-end (127.8 vs 95.9 traj/s, PERF_r03) at
#       IDENTICAL frame/switch accuracy — the AMIS evidence SEM
#       (~0.01-0.1 nats) dwarfs the ~3e-3-nat split-tier logL error — so
#       dataset sweeps ship it by default; single-profile evaluations keep
#       the tighter tier because they cost nothing to keep exact.
#   'exact' — Precision.HIGHEST dots (6 MXU passes); parity vs the f64
#       oracle at the plain f32-storage floor (~3e-6 relative), the
#       BASELINE.md contract tier.
#   'split' — split-bf16 3-pass dots everywhere: +40% kernel throughput
#       (712k -> 1,000k evals/s at the bench shape) at a ~9e-6 parity
#       floor (the bf16 pair carries 16 mantissa bits).
#   'split_cov' — split covariance conjugation only, exact update
#       contraction + mean propagation: the intermediate tier (most of the
#       split speedup, smaller parity give-up). See DESIGN.md 7g.
_ROUSE_MATMUL = "auto"

_MATMUL_MODES = ("auto", "exact", "split", "split_cov")

# 'auto' additionally gates the split tier by trajectory LENGTH: the
# split-bf16 error compounds over the Kalman recursion — measured
# worst-case decision-relevant (per-trajectory-centered) logL error 0.085
# nats at T=100, 0.52 at T=300, 4.5 at T=1000 (`PARITY_LADDER_r05.json`);
# the long-T values reach the scale of adjacent-k evidence gaps. The
# threshold keeps split only where that error stays an order of magnitude
# below the 0.1-1-nat evidence SEs of benched budgets. Above it, 'auto'
# resolves to 'exact' even in lockstep contexts. Explicit modes
# ('split'/'split_cov') are never overridden.
SPLIT_MAX_T = 128


def rouse_matmul() -> str:
    return _ROUSE_MATMUL


def resolve_matmul(context: str = "single", T: int | None = None) -> str:
    """Resolve the configured matmul mode for a dispatch context:
    ``'lockstep'`` (dataset/batch sweeps) or ``'single'`` (adaptive mode,
    direct calls, validation). Only ``'auto'`` is context-dependent; it
    picks the split-bf16 tier on lockstep dispatches of trajectories up
    to ``SPLIT_MAX_T`` frames and the exact tier otherwise (see
    ``SPLIT_MAX_T``)."""
    if context not in ("lockstep", "single"):
        raise ValueError(f"unknown matmul context {context!r}")
    if _ROUSE_MATMUL == "auto":
        if context == "lockstep" and (T is None or T <= SPLIT_MAX_T):
            return "split"
        return "exact"
    return _ROUSE_MATMUL


def set_rouse_matmul(mode: str) -> None:
    global _ROUSE_MATMUL
    if mode not in _MATMUL_MODES:
        raise ValueError(f"rouse_matmul must be one of {_MATMUL_MODES}, "
                         f"got {mode!r}")
    _ROUSE_MATMUL = mode


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 0.2) -> str:
    """Enable JAX's persistent on-disk compilation cache.

    On remote-TPU platforms every distinct program shape costs a fresh
    compile through the tunnel (tens of seconds; occasionally minutes when
    the link degrades), so long-running drivers and benchmarks should always
    persist compiles across processes. ``JAX_COMPILATION_CACHE_DIR`` takes
    precedence if set; otherwise ``path`` (default ``/tmp/jaxcache``).
    Returns the cache directory in effect.

    ``min_compile_secs`` defaults LOW (0.2 s): on a tunneled TPU even
    "fast" compiles pay the round trip, and the many small helper programs
    (trajectory generation, informed-init DP, eager gathers) collectively
    cost tens of seconds per fresh process when not persisted — measured:
    first dataset chunk 61 s -> 16 s with the 2.0 -> 0.2 change.

    Known interaction: with a ``sys.monitoring`` line tracer active (e.g.
    ``COV=1`` test runs) the CPU-backend executable-serialization path can
    abort the process (``Fatal Python error: Aborted`` inside
    ``put_executable_and_time``; CPython 3.12 + XLA, reproduced
    deterministically on this image). Don't enable the persistent cache
    under a coverage tracer — the suite doesn't, and TPU use is unaffected.
    """
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        or path or "/tmp/jaxcache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir


def fdtype():
    """Canonical float dtype: float64 iff x64 is enabled, else float32."""
    return jax.dtypes.canonicalize_dtype(np.float64)


def idtype():
    """Canonical int dtype: int64 iff x64 is enabled, else int32."""
    return jax.dtypes.canonicalize_dtype(np.int64)
