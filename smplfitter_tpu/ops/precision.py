"""Matmul precision policy.

On TPU, the default f32 matmul may be lowered to bf16 passes on the MXU, which
costs ~3 decimal digits — fatal for solve-heavy fitting math. All compute paths
in this package run under the precision returned by :func:`matmul_precision`,
which defaults to ``'highest'`` (true f32). Set ``'default'`` to trade accuracy
for MXU throughput in benchmarks; fit-quality parity must be re-checked.
"""

from __future__ import annotations

import jax

_MATMUL_PRECISION = 'highest'


def set_matmul_precision(precision: str) -> None:
    """Set the package-wide matmul precision ('highest', 'float32', 'default', ...)."""
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = precision


def get_matmul_precision() -> str:
    return _MATMUL_PRECISION


def matmul_precision():
    """Context manager applying the package-wide matmul precision."""
    return jax.default_matmul_precision(_MATMUL_PRECISION)
