"""Differentiability contract: gradients through forward and the full fit
must be finite and nonzero, and match a random-direction finite-difference
probe (per-coordinate FD is too noisy in f32). Mirrors the reference gradient
tests (tests/pt/test_fitter_grad.py there)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import random_params


class TestForwardGrad:
    def test_forward_grad_finite(self, smpl_model):
        pose, betas, trans = random_params(2, seed=100, pose_std=0.1)

        def loss(p, b):
            res = smpl_model(pose_rotvecs=p, shape_betas=b)
            return jnp.sum(res['vertices'] ** 2)

        gp, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(pose), jnp.asarray(betas))
        for g in (gp, gb):
            assert np.all(np.isfinite(np.asarray(g)))
            assert np.abs(np.asarray(g)).max() > 0


class TestFitGrad:
    @pytest.fixture(scope='class')
    def grad_setup(self, smpl_model):
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(smpl_model)
        pose, betas, trans = random_params(2, seed=101, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv = jnp.asarray(res['vertices'])
        tj = jnp.asarray(res['joints'])

        def loss(tv_in):
            fit = fitter.fit(
                tv_in, tj, num_iter=2, beta_regularizer=0.0,
                final_adjust_rots=True, use_kernels=False,
                requested_keys=['shape_betas', 'trans'],
            )
            return jnp.sum(fit['shape_betas'] ** 2) + jnp.sum(fit['trans'] ** 2)

        return loss, tv

    def test_fit_grad_finite_nonzero(self, grad_setup):
        """Backprop through the whole fit (rotation fits, shape solve, final
        adjustment) must give finite, nonzero gradients — guards against
        degenerate branches in the analytic SO(3) projection and solves."""
        loss, tv = grad_setup
        g = jax.grad(loss)(tv)
        g = np.asarray(g)
        assert np.all(np.isfinite(g)), 'non-finite gradient through fit'
        assert np.abs(g).max() > 0, 'zero gradient through fit'

    def test_fit_grad_matches_fd(self, grad_setup):
        """Random-direction finite-difference probe of the fit gradient."""
        loss, tv = grad_setup
        g = jax.grad(loss)(tv)
        rng = np.random.default_rng(102)
        direction = rng.normal(size=tv.shape).astype(np.float32)
        direction /= np.linalg.norm(direction)
        # eps large enough that f32 loss rounding doesn't dominate the quotient.
        eps = 1e-2
        fd = (loss(tv + eps * direction) - loss(tv - eps * direction)) / (2 * eps)
        analytic = jnp.sum(g * direction)
        np.testing.assert_allclose(
            float(analytic), float(fd), rtol=0.12, atol=1e-3
        )
