"""TPU-only gradient smoke tests for the fused-kernel backward passes.

The regular suite runs on CPU (conftest forces the cpu platform), where kernel
VJPs are exercised in interpret mode. These tests verify the REAL Mosaic
backward kernels compile and run on an attached TPU; they skip elsewhere.

Run manually with:
    SMPLFITTER_TPU_TESTS=1 python -m pytest tests/test_tpu_grad.py --no-header
(without the env var, conftest's CPU forcing makes these skip).

Measured on TPU v5e (2026-08-17): grad-of-forward with the backward LBS kernel
compiles in ~3 min and matches the XLA-path gradient to ~2e-4 relative.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

RUN = os.environ.get('SMPLFITTER_TPU_TESTS') == '1'

pytestmark = pytest.mark.skipif(
    not RUN, reason='TPU-only gradient tests (set SMPLFITTER_TPU_TESTS=1)'
)


@pytest.fixture(scope='module')
def tpu_model():
    import jax

    if jax.default_backend() != 'tpu':
        pytest.skip('no TPU attached')
    jax.config.update(
        'jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache'
    )
    import smplfitter_tpu
    from smplfitter_tpu.utils import synthetic

    models_dir = synthetic.ensure_cached_models()
    return smplfitter_tpu.BodyModel(
        'smpl', 'neutral', model_root=models_dir + '/smpl'
    )


def test_grad_of_forward_kernel_vjp(tpu_model):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pose = rng.normal(0, 0.3, (8, 72)).astype(np.float32)
    betas = rng.normal(0, 1, (8, 10)).astype(np.float32)

    def make_loss(use_kernels):
        def loss(p, b):
            out = tpu_model(pose_rotvecs=p, shape_betas=b, use_kernels=use_kernels)
            return jnp.sum(out['vertices'] ** 2)

        return loss

    gk = jax.jit(jax.grad(make_loss(True), argnums=(0, 1)))(pose, betas)
    gx = jax.jit(jax.grad(make_loss(False), argnums=(0, 1)))(pose, betas)
    for a, b in zip(map(np.asarray, gk), map(np.asarray, gx)):
        assert np.all(np.isfinite(a))
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4)


def test_grad_kernels_vs_xla_at_frontier_batch(tpu_model):
    """Kernel-path grads vs XLA-path grads at a production-relevant batch
    (b128, the chunk size of the lax.scan-chunked b4096 grad recipe — see
    benchmark/bench_grad.py --chunk). Catches backward-kernel regressions at
    scale that the b8 smoke tests miss; mirrors the reference's grad
    discipline (/root/reference/tests/pt/test_fitter_grad.py:1-60)."""
    import jax
    import jax.numpy as jnp

    import smplfitter_tpu
    from smplfitter_tpu.ops import lbs_kernels

    B = int(os.environ.get('SMPLFITTER_TPU_GRAD_BATCH', '128'))
    fitter = smplfitter_tpu.BodyFitter(tpu_model)
    rng = np.random.default_rng(5)
    pose = rng.normal(0, 0.2, (B, 72)).astype(np.float32)
    betas = rng.normal(0, 1, (B, 10)).astype(np.float32)
    res = tpu_model(pose_rotvecs=pose, shape_betas=betas)
    tv, tj = jnp.asarray(res['vertices']), jnp.asarray(res['joints'])

    def make_loss(use_kernels):
        def loss(tv):
            fit = fitter.fit(
                tv, tj, num_iter=1, beta_regularizer=0.5,
                final_adjust_rots=False, use_kernels=use_kernels,
                requested_keys=['shape_betas', 'trans'],
            )
            return jnp.sum(fit['shape_betas'] ** 2) + jnp.sum(fit['trans'] ** 2)

        return loss

    lbs_kernels.autodiff_policy = 'kernels'
    try:
        gk = np.asarray(jax.jit(jax.grad(make_loss(True)))(tv))
    finally:
        lbs_kernels.autodiff_policy = 'fallback'
    gx = np.asarray(jax.jit(jax.grad(make_loss(False)))(tv))
    assert np.all(np.isfinite(gk)) and np.abs(gk).max() > 0
    scale = max(1.0, np.abs(gx).max())
    np.testing.assert_allclose(gk / scale, gx / scale, atol=1e-3)


def test_grad_of_fit_shape_step_kernels(tpu_model):
    """One fit iteration (no final adjust) with the fused backward kernels."""
    import jax
    import jax.numpy as jnp

    import smplfitter_tpu
    from smplfitter_tpu.ops import lbs_kernels

    fitter = smplfitter_tpu.BodyFitter(tpu_model)
    rng = np.random.default_rng(1)
    pose = rng.normal(0, 0.2, (8, 72)).astype(np.float32)
    betas = rng.normal(0, 1, (8, 10)).astype(np.float32)
    res = tpu_model(pose_rotvecs=pose, shape_betas=betas)
    tv, tj = jnp.asarray(res['vertices']), jnp.asarray(res['joints'])

    lbs_kernels.autodiff_policy = 'kernels'
    try:

        def loss(tv):
            fit = fitter.fit(
                tv, tj, num_iter=1, beta_regularizer=0.0,
                final_adjust_rots=False, requested_keys=['shape_betas', 'trans'],
            )
            return jnp.sum(fit['shape_betas'] ** 2) + jnp.sum(fit['trans'] ** 2)

        g = jax.jit(jax.grad(loss))(tv)
    finally:
        lbs_kernels.autodiff_policy = 'fallback'
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.abs(g).max() > 0
