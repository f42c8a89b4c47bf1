"""
Global configuration helpers for bild_tpu.

The framework is dtype-polymorphic: on TPU we default to float32 (with
``jax.lax.Precision.HIGHEST`` matmuls so the MXU runs full-precision passes);
for CPU-oracle parity testing the test-suite enables float64 via
``jax.config.update('jax_enable_x64', True)`` and everything follows along.
"""
from __future__ import annotations

import jax
import numpy as np

__all__ = ["fdtype", "idtype", "MATMUL_PRECISION",
           "rouse_kernel", "set_rouse_kernel"]

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


def fdtype():
    """Canonical float dtype: float64 iff x64 is enabled, else float32."""
    return jax.dtypes.canonicalize_dtype(np.float64)


def idtype():
    """Canonical int dtype: int64 iff x64 is enabled, else int32."""
    return jax.dtypes.canonicalize_dtype(np.int64)
