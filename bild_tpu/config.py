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

__all__ = ["fdtype", "idtype", "MATMUL_PRECISION"]

# Precision for the small dense matmuls in the Kalman recursion. These are
# numerically load-bearing (covariance propagation); bf16 passes are not
# acceptable, so always request the full-precision MXU mode.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def fdtype():
    """Canonical float dtype: float64 iff x64 is enabled, else float32."""
    return jax.dtypes.canonicalize_dtype(np.float64)


def idtype():
    """Canonical int dtype: int64 iff x64 is enabled, else int32."""
    return jax.dtypes.canonicalize_dtype(np.int64)
