"""Batched regularized weighted linear least squares on normal equations.

TPU-native formulation: the stacked design matrix is reduced to an (S, S)
Gramian by one large MXU GEMM, followed by a tiny batched Cholesky solve.
Everything is static-shaped and jit-safe.

Semantics match /root/reference/src/smplfitter/np/lstsq.py:7-55 (lstsq and the
block-elimination partial-share solve); the implementation is fresh JAX.

Sharding note (SURVEY.md §2.7): under a batch-sharded ``jax.sharding.Mesh`` the
``shared=True`` reductions below (``jnp.sum`` over the batch axis) are exactly
the points where XLA inserts the cross-chip all-reduce over ICI. They are the
entire "distributed backend" of this workload.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# Accuracy-critical contractions run at HIGHEST precision: on TPU the default
# f32 matmul may round through bf16 passes, which is fatal inside normal
# equations (squared condition number).
_HI = lax.Precision.HIGHEST


def _matmul_t_a(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.einsum('...ji,...jk->...ik', a, b, precision=_HI)


def lstsq(
    matrix: jax.Array,
    rhs: jax.Array,
    weights: jax.Array,
    l2_regularizer: Optional[jax.Array] = None,
    l2_regularizer_rhs: Optional[jax.Array] = None,
    shared: bool = False,
) -> jax.Array:
    """Solve ``argmin_x ||sqrt(w) (matrix @ x - rhs)||^2 + x^T diag(l2) x - 2 x^T l2_rhs``.

    Args:
        matrix: (B, N, P) design matrix.
        rhs: (B, N, K) right-hand side.
        weights: (B, N) row weights.
        l2_regularizer: (P,) Tikhonov diagonal.
        l2_regularizer_rhs: (B, P, K) regularizer pull-target term added to A^T b.
        shared: if True, sum the Gramian and rhs over the batch — one solution
            shared by all instances (this sum is the cross-device all-reduce
            under batch sharding).

    Returns:
        (B, P, K) solution (batch dim 1 if shared).
    """
    weighted_matrix = weights[..., None] * matrix
    gramian = _matmul_t_a(weighted_matrix, matrix)
    if l2_regularizer is not None:
        gramian = gramian + jnp.diag(l2_regularizer)

    atb = _matmul_t_a(weighted_matrix, rhs)
    if l2_regularizer_rhs is not None:
        atb = atb + l2_regularizer_rhs

    if shared:
        gramian = jnp.sum(gramian, axis=0, keepdims=True)
        atb = jnp.sum(atb, axis=0, keepdims=True)

    chol = jnp.linalg.cholesky(gramian)
    return cholesky_solve(chol, atb)


def cholesky_solve(chol: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve ``(L L^T) x = rhs`` given the lower Cholesky factor, batched."""
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(chol, y, lower=True, trans=1)


def solve_spd_unrolled(G: jax.Array, rhs: jax.Array, eps: float = 1e-30) -> jax.Array:
    """Batched SPD solve for SMALL static n via fully unrolled Cholesky.

    ``G``: (..., n, n), ``rhs``: (..., n) or (..., n, k). On TPU, the library
    Cholesky/triangular-solve custom-calls take milliseconds on (B, 13, 13)
    batches; this unrolled form is pure fused elementwise VPU code (O(n^3/3)
    scalar ops on (...,) arrays) and runs in microseconds. Intended for
    n <= ~24.
    """
    n = G.shape[-1]
    vec_rhs = rhs.ndim == G.ndim - 1
    if vec_rhs:
        rhs = rhs[..., None]

    # Cholesky-Crout, unrolled; L stored as scalar (...,)-shaped entries.
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    for j in range(n):
        s = G[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = d
        inv_d = 1.0 / d
        inv_diag[j] = inv_d
        for i in range(j + 1, n):
            s = G[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d

    # Forward substitution L y = rhs.
    y = [None] * n
    for i in range(n):
        s = rhs[..., i, :]
        for k in range(i):
            s = s - L[i][k][..., None] * y[k]
        y[i] = s * inv_diag[i][..., None]
    # Back substitution L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][..., None] * x[k]
        x[i] = s * inv_diag[i][..., None]

    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec_rhs else out


def lstsq_partial_share(
    matrix: jax.Array,
    rhs: jax.Array,
    weights: jax.Array,
    l2_regularizer: jax.Array,
    l2_regularizer_rhs: Optional[jax.Array] = None,
    n_shared: int = 0,
) -> jax.Array:
    """Batch least squares where the first ``n_shared`` params are shared batch-wide.

    Block elimination: (1) solve each instance for its independent params (and
    regress the shared columns on the independent ones), (2) one summed-Gramian
    solve for the shared params on the residual system, (3) back-substitute.
    Regularization enters as extra identity rows appended to the design matrix,
    so only the unregularized solver is needed.
    """
    n_params = matrix.shape[-1]
    n_rhs_outputs = rhs.shape[-1]
    n_indep = n_params - n_shared
    batch = matrix.shape[0]

    if n_indep == 0:
        result = lstsq(matrix, rhs, weights, l2_regularizer, l2_regularizer_rhs, shared=True)
        return jnp.broadcast_to(result, (batch, n_params, n_rhs_outputs))

    eye = jnp.broadcast_to(jnp.eye(n_params, dtype=matrix.dtype), (batch, n_params, n_params))
    matrix = jnp.concatenate([matrix, eye], axis=1)
    if l2_regularizer_rhs is not None:
        rhs = jnp.concatenate([rhs, l2_regularizer_rhs], axis=1)
    else:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((batch, n_params, n_rhs_outputs), dtype=rhs.dtype)], axis=1
        )
    weights = jnp.concatenate(
        [weights, jnp.broadcast_to(l2_regularizer, (batch, n_params)).astype(weights.dtype)],
        axis=1,
    )

    matrix_shared = matrix[..., :n_shared]
    matrix_indep = matrix[..., n_shared:]

    both = lstsq(matrix_indep, jnp.concatenate([matrix_shared, rhs], axis=-1), weights)
    coeff_indep2shared = both[..., :n_shared]
    coeff_indep2rhs = both[..., n_shared:]

    coeff_shared2rhs = lstsq(
        matrix_shared - jnp.matmul(matrix_indep, coeff_indep2shared, precision=_HI),
        rhs - jnp.matmul(matrix_indep, coeff_indep2rhs, precision=_HI),
        weights,
        shared=True,
    )

    # matmul broadcasts the batch-1 shared solution against the full batch.
    coeff_indep2rhs = coeff_indep2rhs - jnp.matmul(
        coeff_indep2shared, coeff_shared2rhs, precision=_HI
    )
    coeff_shared2rhs = jnp.broadcast_to(coeff_shared2rhs, (batch, n_shared, n_rhs_outputs))
    return jnp.concatenate([coeff_shared2rhs, coeff_indep2rhs], axis=1)
