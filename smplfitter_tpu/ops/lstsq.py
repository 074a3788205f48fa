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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# Accuracy-critical contractions run at HIGHEST precision: on TPU the default
# f32 matmul may round through bf16 passes, which is fatal inside normal
# equations (squared condition number).
_HI = lax.Precision.HIGHEST

# Inside a ``jax.shard_map`` region the batch axis is per-device LOCAL, so the
# shared-block sums below must be completed with an explicit cross-device
# psum. ``parallel.sharding.cross_shard`` sets this to the mesh axis name;
# under plain GSPMD jit it stays None and XLA derives the all-reduce itself.
# A ContextVar (not a module global) so a cross_shard region is scoped to the
# trace that opened it — concurrent traces on other threads are unaffected.
import contextvars

CROSS_SHARD_AXIS: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    'smplfitter_cross_shard_axis', default=None
)


def batch_reduce_sum(x: jax.Array, axis=0, keepdims: bool = False) -> jax.Array:
    """Sum over the (possibly device-local) batch axis, completed with a
    ``psum`` over the mesh axis when inside a ``cross_shard`` region."""
    s = jnp.sum(x, axis=axis, keepdims=keepdims)
    axis_name = CROSS_SHARD_AXIS.get()
    if axis_name is not None:
        s = lax.psum(s, axis_name)
    return s


def normal_equations(
    matrix: jax.Array,
    rhs: jax.Array,
    weights: jax.Array,
    ridge: Optional[jax.Array] = None,
    ridge_rhs: Optional[jax.Array] = None,
):
    """Reduce a weighted least-squares system to its normal equations.

    One MXU GEMM each for the Gramian ``A^T W A`` (..., P, P) and the moment
    ``A^T W b`` (..., P, K); ``ridge`` adds a Tikhonov diagonal and
    ``ridge_rhs`` a raw additive pull-target term on the moment.
    """
    row_scaled = matrix * weights[..., None]
    gram = jnp.einsum('...ji,...jk->...ik', row_scaled, matrix, precision=_HI)
    moment = jnp.einsum('...ji,...jk->...ik', row_scaled, rhs, precision=_HI)
    if ridge is not None:
        gram = gram + jnp.diag(ridge)
    if ridge_rhs is not None:
        moment = moment + ridge_rhs
    return gram, moment


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
    gram, moment = normal_equations(
        matrix, rhs, weights, l2_regularizer, l2_regularizer_rhs
    )
    if shared:
        gram = batch_reduce_sum(gram, axis=0, keepdims=True)
        moment = batch_reduce_sum(moment, axis=0, keepdims=True)
    return cholesky_solve(jnp.linalg.cholesky(gram), moment)


def cholesky_solve(chol: jax.Array, rhs: jax.Array) -> jax.Array:
    """Solve ``(L L^T) x = rhs`` given the lower Cholesky factor, batched."""
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(chol, y, lower=True, trans=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def solve_spd_unrolled(G: jax.Array, rhs: jax.Array, eps: float = 1e-30) -> jax.Array:
    """Batched SPD solve for SMALL static n via fully unrolled Cholesky.

    ``G``: (..., n, n), ``rhs``: (..., n) or (..., n, k). On TPU, the library
    Cholesky/triangular-solve custom-calls take milliseconds on (B, 13, 13)
    batches; this unrolled form is pure fused elementwise VPU code (O(n^3/3)
    scalar ops on (...,) arrays) and runs in microseconds. Intended for
    n <= ~24.

    Carries a closed-form VJP (one more unrolled solve + an outer product)
    instead of the autodiff transpose of the unrolled factorization: the
    transposed Cholesky graph is ~4x the forward's op count and was the
    single largest contributor to grad-of-fit compile size (~31% of all
    equations), which overflows this environment's AOT compiler at
    num_iter >= 2. Only the lower triangle of ``G`` is read, so the returned
    cotangent lives on the lower triangle (off-diagonal entries accumulate
    both symmetric partners); semantically G is the symmetric matrix it
    represents.
    """
    return _solve_spd_unrolled_impl(G, rhs, eps)


def _solve_spd_unrolled_impl(G: jax.Array, rhs: jax.Array, eps: float) -> jax.Array:
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


def _solve_spd_fwd(G, rhs, eps):
    x = _solve_spd_unrolled_impl(G, rhs, eps)
    return x, (G, x)


def _solve_spd_bwd(eps, res, g):
    # x = A⁻¹ b with A = sym-from-lower(G):  b̄ = A⁻¹ x̄ (A symmetric),
    # Ā = −b̄ xᵀ (summed over rhs columns). G's upper triangle is never read,
    # so the full-matrix cotangent folds onto the lower triangle:
    # Ḡ[i,j] = Ā[i,j] + Ā[j,i] (i > j), Ḡ[j,j] = Ā[j,j].
    G, x = res
    vec = x.ndim == G.ndim - 1
    rhs_bar = _solve_spd_unrolled_impl(G, g, eps)
    if vec:
        A_bar = -rhs_bar[..., :, None] * x[..., None, :]
    else:
        A_bar = -jnp.einsum('...ik,...jk->...ij', rhs_bar, x, precision=_HI)
    n = G.shape[-1]
    lower = jnp.tril(jnp.ones((n, n), dtype=bool), -1)
    G_bar = (
        A_bar * jnp.eye(n, dtype=A_bar.dtype)
        + jnp.where(lower, A_bar + jnp.swapaxes(A_bar, -1, -2), 0.0)
    )
    return G_bar, rhs_bar


solve_spd_unrolled.defvjp(_solve_spd_fwd, _solve_spd_bwd)


def lstsq_partial_share(
    matrix: jax.Array,
    rhs: jax.Array,
    weights: jax.Array,
    l2_regularizer: jax.Array,
    l2_regularizer_rhs: Optional[jax.Array] = None,
    n_shared: int = 0,
    batch_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Batch least squares where the first ``n_shared`` params are shared batch-wide.

    Schur-complement elimination on the PARTITIONED NORMAL EQUATIONS: the full
    (P, P) Gramian is formed once per instance and split into shared (s) /
    independent (i) blocks; each instance locally eliminates its independent
    block (one small Cholesky serving both the coupling columns and the
    moment), and only the (S, S) Schur complement ``Gss − Gsi Gii⁻¹ Gis`` and
    its moment are summed over the batch — that sum is the cross-chip
    all-reduce under batch sharding. Back-substitution recovers per-instance
    independent params. Equivalent to the reference's appended-identity-row
    residual scheme (/root/reference/src/smplfitter/np/lstsq.py:26-55) but
    never materializes augmented design matrices, and runs one Gramian GEMM
    instead of two.

    Regularization semantics match the reference's identity-row trick: the
    Tikhonov diagonal is applied per instance (so the shared block accumulates
    it B times), and the pull-target ``l2_regularizer_rhs`` enters scaled by
    the regularizer weights.

    ``batch_mask`` (B,) zeroes selected instances' contributions to the
    shared-block sums (their independent solves still run, on whatever data
    they carry — replicated padding keeps them well conditioned). This makes
    BATCH PADDING exact under sharing: a padded instance with mask 0
    contributes nothing, so the shared solution equals the unpadded one.
    """
    n_params = matrix.shape[-1]
    n_out = rhs.shape[-1]
    n_indep = n_params - n_shared
    batch = matrix.shape[0]

    pull = None
    if l2_regularizer_rhs is not None:
        pull = l2_regularizer[:, None] * l2_regularizer_rhs

    if n_indep == 0:
        gram, moment = normal_equations(
            matrix, rhs, weights, l2_regularizer, pull
        )
        if batch_mask is not None:
            gram = gram * batch_mask[:, None, None]
            moment = moment * batch_mask[:, None, None]
        gram = batch_reduce_sum(gram, axis=0, keepdims=True)
        moment = batch_reduce_sum(moment, axis=0, keepdims=True)
        result = cholesky_solve(jnp.linalg.cholesky(gram), moment)
        return jnp.broadcast_to(result, (batch, n_params, n_out))

    gram, moment = normal_equations(matrix, rhs, weights, l2_regularizer, pull)
    g_ss = gram[..., :n_shared, :n_shared]
    g_si = gram[..., :n_shared, n_shared:]
    g_ii = gram[..., n_shared:, n_shared:]
    m_s = moment[..., :n_shared, :]
    m_i = moment[..., n_shared:, :]

    # Local elimination of the independent block, for coupling and moment at once.
    chol_ii = jnp.linalg.cholesky(g_ii)
    eliminated = cholesky_solve(
        chol_ii, jnp.concatenate([jnp.swapaxes(g_si, -1, -2), m_i], axis=-1)
    )
    pivot_s = eliminated[..., :n_shared]  # Gii⁻¹ Gis, (B, I, S)
    pivot_k = eliminated[..., n_shared:]  # Gii⁻¹ bi,  (B, I, K)

    schur_contrib = g_ss - jnp.matmul(g_si, pivot_s, precision=_HI)
    moment_contrib = m_s - jnp.matmul(g_si, pivot_k, precision=_HI)
    if batch_mask is not None:
        schur_contrib = schur_contrib * batch_mask[:, None, None]
        moment_contrib = moment_contrib * batch_mask[:, None, None]
    schur = batch_reduce_sum(schur_contrib, axis=0, keepdims=True)
    schur_moment = batch_reduce_sum(moment_contrib, axis=0, keepdims=True)
    x_shared = cholesky_solve(jnp.linalg.cholesky(schur), schur_moment)  # (1, S, K)

    # matmul broadcasts the batch-1 shared solution against the full batch.
    x_indep = pivot_k - jnp.matmul(pivot_s, x_shared, precision=_HI)
    return jnp.concatenate(
        [jnp.broadcast_to(x_shared, (batch, n_shared, n_out)), x_indep], axis=1
    )
