"""Kernel path at arbitrary batch sizes via batch-tile padding.

The fused lane-major kernels tile the batch dim in multiples of 8; fits at
other batch sizes replicate the last instance up to the tile, run the kernel
path, and drop the padded lanes (bodyfitter._pad_batch/_slice_batch). These
tests force interpret-mode kernels (CPU) and compare against the pure-XLA
batch-major path on the SAME inputs — padding must not change any real
instance's output beyond kernel-vs-XLA float noise.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import random_params


@pytest.fixture(scope='module')
def smpl_fitter(smpl_model):
    from smplfitter_tpu import BodyFitter

    return BodyFitter(smpl_model)


def _forced_kernels(fn, *args, **kwargs):
    from smplfitter_tpu.ops import lbs_kernels

    lbs_kernels.FORCE_INTERPRET = True
    try:
        return fn(*args, **kwargs)
    finally:
        lbs_kernels.FORCE_INTERPRET = False


@pytest.mark.parametrize('batch', [3, 5])
def test_fit_odd_batch_matches_xla(smpl_model, smpl_fitter, batch):
    pose, betas, trans = random_params(batch, seed=71, pose_std=0.1)
    res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
    kw = dict(
        target_vertices=res['vertices'],
        target_joints=res['joints'],
        num_iter=2,
        beta_regularizer=0.5,
        final_adjust_rots=True,
        requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
    )
    ref = smpl_fitter.fit(use_kernels=False, **kw)
    got = _forced_kernels(smpl_fitter.fit, **kw)
    assert got['shape_betas'].shape[0] == batch
    np.testing.assert_allclose(
        np.asarray(got['shape_betas']), np.asarray(ref['shape_betas']), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got['pose_rotvecs']), np.asarray(ref['pose_rotvecs']), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got['trans']), np.asarray(ref['trans']), atol=5e-4
    )


def test_fit_odd_batch_warm_start(smpl_model, smpl_fitter):
    """Warm-started odd-batch fit (the flipper configuration) pads initial_*."""
    pose, betas, trans = random_params(5, seed=72, pose_std=0.1)
    res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
    init = pose + np.random.RandomState(4).randn(*pose.shape).astype(np.float32) * 0.05
    kw = dict(
        target_vertices=res['vertices'],
        target_joints=res['joints'],
        num_iter=1,
        beta_regularizer=1e-2,
        initial_pose_rotvecs=init,
        initial_shape_betas=betas,
        requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
    )
    ref = smpl_fitter.fit(use_kernels=False, **kw)
    got = _forced_kernels(smpl_fitter.fit, **kw)
    np.testing.assert_allclose(
        np.asarray(got['shape_betas']), np.asarray(ref['shape_betas']), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got['trans']), np.asarray(ref['trans']), atol=5e-4
    )


def test_fit_odd_batch_weighted(smpl_model, smpl_fitter):
    """Per-call vertex weights pad along the batch dim too."""
    batch = 6
    pose, betas, trans = random_params(batch, seed=73, pose_std=0.1)
    res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
    rng = np.random.default_rng(7)
    vw = rng.uniform(0.2, 1.0, (batch, res['vertices'].shape[1])).astype(np.float32)
    jw = rng.uniform(0.2, 1.0, (batch, res['joints'].shape[1])).astype(np.float32)
    kw = dict(
        target_vertices=res['vertices'],
        target_joints=res['joints'],
        vertex_weights=vw,
        joint_weights=jw,
        num_iter=2,
        beta_regularizer=0.5,
        requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
    )
    ref = smpl_fitter.fit(use_kernels=False, **kw)
    got = _forced_kernels(smpl_fitter.fit, **kw)
    np.testing.assert_allclose(
        np.asarray(got['shape_betas']), np.asarray(ref['shape_betas']), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got['trans']), np.asarray(ref['trans']), atol=5e-4
    )


def test_fit_share_beta_odd_batch_stays_exact(smpl_model, smpl_fitter):
    """share_beta couples instances through the summed Gramian; odd batches
    pad by replication but the padded instances enter the shared-block sums
    with weight 0 (batch_mask), so the shared beta is EXACTLY the unpadded
    one. The kernel-forced padded run must match the XLA batch-major run to
    kernel float noise, with std(betas) tiny across the batch."""
    pose, betas, trans = random_params(5, seed=74, pose_std=0.1)
    betas = np.broadcast_to(betas[:1], betas.shape).copy()
    res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
    kw = dict(
        target_vertices=res['vertices'],
        target_joints=res['joints'],
        num_iter=2,
        share_beta=True,
        beta_regularizer=0.0,
        requested_keys=('shape_betas', 'trans'),
    )
    ref = smpl_fitter.fit(use_kernels=False, **kw)
    got = _forced_kernels(smpl_fitter.fit, **kw)
    assert got['shape_betas'].shape[0] == 5
    np.testing.assert_allclose(
        np.asarray(got['shape_betas']), np.asarray(ref['shape_betas']), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got['trans']), np.asarray(ref['trans']), atol=5e-4
    )
    assert float(np.std(np.asarray(got['shape_betas']), axis=0).max()) < 1e-5

    # Exactness of the mask itself: the padded kernel run at batch 5 must
    # give the same shared beta as the kernel run on the tile-aligned batch 8
    # whose last 3 instances are absent (i.e. the 5-instance problem) — NOT
    # the one where the replicas participate.
    got8 = _forced_kernels(
        smpl_fitter.fit,
        target_vertices=np.concatenate(
            [res['vertices']] + [res['vertices'][-1:]] * 3, axis=0
        ),
        target_joints=np.concatenate(
            [res['joints']] + [res['joints'][-1:]] * 3, axis=0
        ),
        num_iter=2, share_beta=True, beta_regularizer=0.0,
        requested_keys=('shape_betas',),
    )
    biased = np.asarray(got8['shape_betas'])[0]
    exact = np.asarray(got['shape_betas'])[0]
    ref0 = np.asarray(ref['shape_betas'])[0]
    # The replicated-participation beta is measurably different from the true
    # shared beta; the masked one is not.
    assert np.abs(exact - ref0).max() < np.abs(biased - ref0).max() or \
        np.abs(biased - ref0).max() < 1e-6


def test_known_pose_share_beta_odd_batch(smpl_model, smpl_fitter):
    pose, betas, trans = random_params(6, seed=78, pose_std=0.1)
    betas = np.broadcast_to(betas[:1], betas.shape).copy()
    res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
    kw = dict(
        pose_rotvecs=pose,
        target_vertices=res['vertices'],
        target_joints=res['joints'],
        share_beta=True,
        beta_regularizer=0.1,
    )
    ref = smpl_fitter.fit_with_known_pose(use_kernels=False, **kw)
    got = _forced_kernels(smpl_fitter.fit_with_known_pose, **kw)
    assert got['shape_betas'].shape[0] == 6
    np.testing.assert_allclose(
        np.asarray(got['shape_betas']), np.asarray(ref['shape_betas']), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got['trans']), np.asarray(ref['trans']), atol=5e-4
    )


def test_known_pose_odd_batch(smpl_model, smpl_fitter):
    pose, betas, trans = random_params(7, seed=75, pose_std=0.1)
    res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
    kw = dict(
        pose_rotvecs=pose,
        target_vertices=res['vertices'],
        target_joints=res['joints'],
        beta_regularizer=0.5,
    )
    ref = smpl_fitter.fit_with_known_pose(use_kernels=False, **kw)
    got = _forced_kernels(smpl_fitter.fit_with_known_pose, **kw)
    assert got['shape_betas'].shape[0] == 7
    np.testing.assert_allclose(
        np.asarray(got['shape_betas']), np.asarray(ref['shape_betas']), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got['trans']), np.asarray(ref['trans']), atol=5e-4
    )


def test_known_shape_odd_batch(smpl_model, smpl_fitter):
    pose, betas, trans = random_params(3, seed=76, pose_std=0.1)
    res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
    kw = dict(
        shape_betas=betas,
        target_vertices=res['vertices'],
        target_joints=res['joints'],
        num_iter=2,
        final_adjust_rots=True,
        requested_keys=('pose_rotvecs', 'trans'),
    )
    ref = smpl_fitter.fit_with_known_shape(use_kernels=False, **kw)
    got = _forced_kernels(smpl_fitter.fit_with_known_shape, **kw)
    assert got['pose_rotvecs'].shape[0] == 3
    np.testing.assert_allclose(
        np.asarray(got['pose_rotvecs']), np.asarray(ref['pose_rotvecs']), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got['trans']), np.asarray(ref['trans']), atol=1e-3
    )


def test_padding_under_jit(smpl_model, smpl_fitter):
    """The padded dispatch is trace-static: an odd-batch fit jits cleanly."""
    import jax

    pose, betas, trans = random_params(5, seed=77, pose_std=0.1)
    res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)

    fit_fn = jax.jit(
        lambda tv, tj: smpl_fitter.fit(
            tv, tj, num_iter=2, beta_regularizer=0.5,
            requested_keys=('shape_betas', 'trans'),
        )
    )
    eager = smpl_fitter.fit(
        res['vertices'], res['joints'], num_iter=2, beta_regularizer=0.5,
        requested_keys=('shape_betas', 'trans'),
    )
    jitted = fit_fn(res['vertices'], res['joints'])
    np.testing.assert_allclose(
        np.asarray(jitted['shape_betas']), np.asarray(eager['shape_betas']),
        atol=1e-5,
    )
