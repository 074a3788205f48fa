"""Unit tests for the least-squares solvers (ops/lstsq.py)."""

from __future__ import annotations

import numpy as np

from smplfitter_tpu.ops import lstsq as L


def _random_system(batch=4, n=200, p=7, k=2, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(batch, n, p)).astype(np.float32)
    b = rng.normal(size=(batch, n, k)).astype(np.float32)
    w = rng.uniform(0.5, 2.0, size=(batch, n)).astype(np.float32)
    return A, b, w


class TestLstsq:
    def test_matches_numpy(self):
        A, b, w = _random_system()
        x = np.asarray(L.lstsq(A, b, w))
        for i in range(len(A)):
            Aw = A[i] * w[i][:, None]
            x_ref = np.linalg.solve(Aw.T @ A[i], Aw.T @ b[i])
            np.testing.assert_allclose(x[i], x_ref, atol=2e-4)

    def test_regularizer(self):
        A, b, w = _random_system(seed=1)
        reg = np.array([10.0] * A.shape[-1], np.float32)
        x = np.asarray(L.lstsq(A, b, w, reg))
        x0 = np.asarray(L.lstsq(A, b, w))
        assert np.all(np.linalg.norm(x, axis=1) < np.linalg.norm(x0, axis=1))

    def test_shared(self):
        A, b, w = _random_system(seed=2)
        x = np.asarray(L.lstsq(A, b, w, shared=True))
        assert x.shape[0] == 1
        # Equals solving the concatenated system.
        Aw = (A * w[..., None]).reshape(-1, A.shape[-1])
        A_flat = A.reshape(-1, A.shape[-1])
        x_ref = np.linalg.solve(Aw.T @ A_flat, Aw.T @ b.reshape(-1, b.shape[-1]))
        np.testing.assert_allclose(x[0], x_ref, atol=2e-4)


class TestPartialShare:
    def test_reduces_to_shared_and_indep(self):
        A, b, w = _random_system(batch=3, n=100, p=6, k=1, seed=3)
        reg = np.full((6,), 0.1, np.float32)
        x = np.asarray(L.lstsq_partial_share(A, b, w, reg, n_shared=2))
        # Shared part identical across batch.
        np.testing.assert_allclose(x[:, :2], np.broadcast_to(x[:1, :2], x[:, :2].shape),
                                   atol=1e-6)
        # Solution minimizes the regularized objective: compare against a
        # direct block solve of the coupled normal equations.
        p, ns = 6, 2
        ni = p - ns
        big_n = ns + 3 * ni
        G = np.zeros((big_n, big_n))
        r = np.zeros((big_n, 1))
        for i in range(3):
            Aw = A[i] * w[i][:, None]
            Gi = Aw.T @ A[i] + np.diag(reg)
            ri = Aw.T @ b[i]
            G[:ns, :ns] += Gi[:ns, :ns]
            sl = slice(ns + i * ni, ns + (i + 1) * ni)
            G[sl, sl] = Gi[ns:, ns:]
            G[:ns, sl] = Gi[:ns, ns:]
            G[sl, :ns] = Gi[ns:, :ns]
            r[:ns] += ri[:ns]
            r[sl] = ri[ns:]
        sol = np.linalg.solve(G, r)[:, 0]
        np.testing.assert_allclose(x[0, :2, 0], sol[:ns], atol=2e-4)
        for i in range(3):
            np.testing.assert_allclose(
                x[i, 2:, 0], sol[ns + i * ni : ns + (i + 1) * ni], atol=2e-4
            )


class TestSolveSpdUnrolled:
    def test_matches_cholesky(self):
        rng = np.random.default_rng(4)
        for n in (3, 4, 13):
            A = rng.normal(size=(8, n, n + 3)).astype(np.float32)
            G = A @ np.swapaxes(A, -1, -2) + np.eye(n, dtype=np.float32) * 0.1
            rhs = rng.normal(size=(8, n)).astype(np.float32)
            x = np.asarray(L.solve_spd_unrolled(G, rhs))
            x_ref = np.linalg.solve(G, rhs[..., None])[..., 0]
            np.testing.assert_allclose(x, x_ref, atol=2e-4)

    def test_matrix_rhs(self):
        rng = np.random.default_rng(5)
        n, k = 5, 4
        A = rng.normal(size=(2, n, n + 2)).astype(np.float32)
        G = A @ np.swapaxes(A, -1, -2) + np.eye(n, dtype=np.float32) * 0.1
        rhs = rng.normal(size=(2, n, k)).astype(np.float32)
        x = np.asarray(L.solve_spd_unrolled(G, rhs))
        x_ref = np.linalg.solve(G, rhs)
        np.testing.assert_allclose(x, x_ref, atol=2e-4)

    def test_jit(self):
        import jax

        rng = np.random.default_rng(6)
        A = rng.normal(size=(4, 13, 16)).astype(np.float32)
        G = A @ np.swapaxes(A, -1, -2) + np.eye(13, dtype=np.float32)
        rhs = rng.normal(size=(4, 13)).astype(np.float32)
        x = np.asarray(jax.jit(L.solve_spd_unrolled)(G, rhs))
        x_ref = np.linalg.solve(G, rhs[..., None])[..., 0]
        np.testing.assert_allclose(x, x_ref, atol=2e-4)

    def test_custom_vjp_matches_autodiff(self):
        """The closed-form VJP (one extra solve + outer product; added to keep
        grad-of-fit inside AOT compile budgets) must equal the autodiff
        transpose of the unrolled factorization."""
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        n = 9
        A = rng.normal(size=(3, n, n + 4)).astype(np.float32)
        G = jnp.asarray(A @ np.swapaxes(A, -1, -2) + np.eye(n, dtype=np.float32))
        for rhs_shape in ((3, n), (3, n, 2)):
            rhs = jnp.asarray(rng.normal(size=rhs_shape).astype(np.float32))

            def loss(G, rhs):
                return jnp.sum(jnp.sin(L.solve_spd_unrolled(G, rhs)))

            def loss_ref(G, rhs):
                return jnp.sum(jnp.sin(L._solve_spd_unrolled_impl(G, rhs, 1e-30)))

            for argnum in (0, 1):
                g = jax.grad(loss, argnums=argnum)(G, rhs)
                g_ref = jax.grad(loss_ref, argnums=argnum)(G, rhs)
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(g_ref), atol=2e-6
                )
