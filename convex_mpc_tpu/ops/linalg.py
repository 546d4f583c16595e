"""Precision-pinned contraction helpers.

On TPU the *default* matmul precision truncates f32 operands to bfloat16
(~3e-3 relative error). For control-stack numerics — kinematics, dynamics,
QP data, solver iterations — that error is unacceptable (it exceeds the 2%
force-parity budget and corrupts foot positions by ~0.5 mm). Every
numeric-critical contraction in this package goes through these helpers so
full f32 precision is explicit. Bulk ML-style matmuls that can tolerate bf16
should NOT use these.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

PRECISION = lax.Precision.HIGHEST


def mm(a, b):
    """Precision-pinned matmul (batched ok)."""
    return jnp.matmul(a, b, precision=PRECISION)


def ein(subscripts, *operands):
    """Precision-pinned einsum."""
    return jnp.einsum(subscripts, *operands, precision=PRECISION)
