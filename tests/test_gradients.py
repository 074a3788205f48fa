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


class TestAutodiffPolicy:
    """fit's kernel path under autodiff follows lbs_kernels.autodiff_policy."""

    def _loss(self, fitter, tj):
        def loss(tv):
            fit = fitter.fit(
                tv, tj, num_iter=1, beta_regularizer=0.0,
                requested_keys=['shape_betas'],
            )
            return jnp.sum(fit['shape_betas'] ** 2)
        return loss

    def test_default_fallback_matches_explicit_xla(self, smpl_model):
        """With the default policy, grad-of-fit with kernels nominally ON is
        silently routed to the XLA path — gradients equal use_kernels=False."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(11)
        pose = rng.normal(0, 0.1, (8, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (8, 10)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        tv, tj = jnp.asarray(res['vertices']), jnp.asarray(res['joints'])

        assert lbs_kernels.autodiff_policy == 'fallback'
        g_auto = jax.grad(self._loss(fitter, tj))(tv)

        def loss_xla(tv):
            fit = fitter.fit(
                tv, tj, num_iter=1, beta_regularizer=0.0, use_kernels=False,
                requested_keys=['shape_betas'],
            )
            return jnp.sum(fit['shape_betas'] ** 2)

        g_xla = jax.grad(loss_xla)(tv)
        np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_xla), atol=0)

    def test_error_policy_raises(self, smpl_model):
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(12)
        pose = rng.normal(0, 0.1, (8, 72)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose)
        tv, tj = jnp.asarray(res['vertices']), jnp.asarray(res['joints'])

        lbs_kernels.autodiff_policy = 'error'
        try:
            with pytest.raises(ValueError, match='use_kernels=False'):
                jax.grad(self._loss(fitter, tj))(tv)
        finally:
            lbs_kernels.autodiff_policy = 'fallback'

    def test_known_pose_shape_follow_policy(self, smpl_model):
        """fit_with_known_pose / fit_with_known_shape honor the same autodiff
        policy as fit: default-policy grads equal the explicit XLA path."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(13)
        pose = rng.normal(0, 0.1, (8, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (8, 10)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        tv, tj = jnp.asarray(res['vertices']), jnp.asarray(res['joints'])
        assert lbs_kernels.autodiff_policy == 'fallback'

        def loss_kp(tv, **kw):
            fit = fitter.fit_with_known_pose(
                pose, tv, target_joints=tj, beta_regularizer=0.0, **kw
            )
            return jnp.sum(fit['shape_betas'] ** 2)

        g_auto = jax.grad(loss_kp)(tv)
        g_xla = jax.grad(lambda tv: loss_kp(tv, use_kernels=False))(tv)
        np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_xla), atol=0)

        def loss_ks(tv, **kw):
            fit = fitter.fit_with_known_shape(
                betas, tv, target_joints=tj, **kw
            )
            return jnp.sum(fit['trans'] ** 2)

        g_auto = jax.grad(loss_ks)(tv)
        g_xla = jax.grad(lambda tv: loss_ks(tv, use_kernels=False))(tv)
        np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_xla), atol=0)

        lbs_kernels.autodiff_policy = 'error'
        try:
            with pytest.raises(ValueError, match='fit_with_known_pose'):
                jax.grad(loss_kp)(tv)
            with pytest.raises(ValueError, match='fit_with_known_shape'):
                jax.grad(loss_ks)(tv)
        finally:
            lbs_kernels.autodiff_policy = 'fallback'

    def test_non_autodiff_keeps_kernels(self, smpl_model):
        """Plain (non-grad) tracing must NOT be affected by the policy: the
        kernel path still activates (observable via FORCE_INTERPRET)."""
        from smplfitter_tpu.ops import lbs_kernels

        # under_autodiff is False for concrete arrays and plain jit tracers.
        x = jnp.zeros((4, 3))
        assert not lbs_kernels.under_autodiff(x, None)
        jax.jit(lambda v: lbs_kernels.under_autodiff(v) and 1 or 0)(x)

        def probe(v):
            return lbs_kernels.under_autodiff(v)

        assert jax.jit(lambda v: jnp.where(probe(v), 1, 0))(x) == 0

    def test_under_autodiff_detects_jvp(self):
        from smplfitter_tpu.ops import lbs_kernels

        seen = []

        def f(x):
            seen.append(lbs_kernels.under_autodiff(x))
            return jnp.sum(x**2)

        jax.grad(f)(jnp.ones(3))
        assert seen[-1] is True
        seen.clear()
        jax.jit(jax.grad(f))(jnp.ones(3))
        assert seen[-1] is True
        seen.clear()
        jax.vmap(jax.grad(f))(jnp.ones((2, 3)))
        assert seen[-1] is True


class TestHoistConstants:
    """smplfitter_tpu.hoist_constants: closed-over model constants become
    explicit jit parameters (the grad-of-fit compile-size fix; see api.py)."""

    def test_matches_direct_and_differentiates(self, smpl_model):
        import smplfitter_tpu
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(smpl_model)
        pose, betas, trans = random_params(2, seed=103, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = jnp.asarray(res['vertices']), jnp.asarray(res['joints'])

        def loss(tv, tj):
            fit = fitter.fit(
                tv, tj, num_iter=2, beta_regularizer=1.0, use_kernels=False,
                requested_keys=['shape_betas', 'trans'],
            )
            return jnp.sum(fit['shape_betas'] ** 2) + jnp.sum(fit['trans'] ** 2)

        loss_h, consts = smplfitter_tpu.hoist_constants(loss, tv, tj)
        # Values match the direct call.
        np.testing.assert_allclose(
            float(loss_h(consts, tv, tj)), float(loss(tv, tj)), rtol=1e-6
        )
        # Gradients of the hoisted form match direct gradients.
        g_h = jax.grad(lambda v: loss_h(consts, v, tj))(tv)
        g_d = jax.grad(lambda v: loss(v, tj))(tv)
        np.testing.assert_allclose(
            np.asarray(g_h), np.asarray(g_d), rtol=1e-4, atol=1e-6
        )

    def test_shape_specialized(self, smpl_model):
        import smplfitter_tpu

        def f(x):
            return jnp.sum(x * smpl_model.data.v_template)

        ex = jnp.zeros((smpl_model.num_vertices, 3))
        f_h, consts = smplfitter_tpu.hoist_constants(f, ex)
        assert len(consts) >= 1
        np.testing.assert_allclose(
            float(f_h(consts, jnp.ones((smpl_model.num_vertices, 3)))),
            float(np.sum(np.asarray(smpl_model.data.v_template))),
            rtol=1e-5,
        )


class TestGetFitGradFn:
    """smplfitter_tpu.get_fit_grad_fn: the packaged production grad recipe
    (hoisted constants + lax.scan batch chunking + per-shape caching)."""

    def test_chunked_matches_monolithic(self, smpl_model):
        import smplfitter_tpu

        fitter = smplfitter_tpu.BodyFitter(smpl_model)
        pose, betas, trans = random_params(8, seed=104, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = jnp.asarray(res['vertices']), jnp.asarray(res['joints'])

        kw = dict(num_iter=2, final_adjust_rots=False)
        vg_mono = smplfitter_tpu.get_fit_grad_fn(fitter, chunk=None, **kw)
        vg_chunk = smplfitter_tpu.get_fit_grad_fn(fitter, chunk=4, **kw)
        v_m, (g_tv_m, g_tj_m) = vg_mono(tv, tj)
        v_c, (g_tv_c, g_tj_c) = vg_chunk(tv, tj)

        g = np.asarray(g_tv_c)
        assert np.isfinite(g).all() and np.abs(g).max() > 0
        # Fits are per-instance independent: the chunked summed loss and its
        # grad must equal the monolithic ones (up to f32 reduction order).
        np.testing.assert_allclose(float(v_c), float(v_m), rtol=1e-5)
        # f32 reduction order differs between the scanned and monolithic
        # programs; tolerances sized to that noise on O(1e-1) grads.
        np.testing.assert_allclose(g, np.asarray(g_tv_m), rtol=2e-3, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(g_tj_c), np.asarray(g_tj_m), rtol=2e-3, atol=5e-4
        )


class TestCheckKernelParity:
    def test_self_check_passes(self, smpl_model):
        """BodyFitter.check_kernel_parity: the library-level guard behind the
        5-term blend packing (runs the kernels in interpret mode on CPU)."""
        import smplfitter_tpu

        fitter = smplfitter_tpu.BodyFitter(smpl_model)
        rep = fitter.check_kernel_parity(batch=8, num_iter=2)
        assert rep['ok']
        assert rep['max_dbetas'] <= 1e-3
        assert abs(rep['v2v_kernel_mm'] - rep['v2v_xla_mm']) <= 0.05
