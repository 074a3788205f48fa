"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Checks that (a) the fit compiles and runs with batch-sharded inputs, (b) the
results match the unsharded computation, and (c) share_beta — whose
summed-Gramian reduction is THE cross-chip collective of this workload —
produces identical shared betas across devices.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from conftest import random_params


@pytest.fixture(scope='session')
def mesh():
    from smplfitter_tpu.parallel import make_mesh

    if len(jax.devices()) != 8:
        # On the CPU conftest the 8-device virtual mesh is guaranteed — a
        # shortfall there is a provisioning REGRESSION, not a skip condition
        # (the sharding suite guards the only cross-chip collective).
        if jax.default_backend() == 'cpu':
            pytest.fail(
                'conftest should have provisioned 8 virtual CPU devices, got '
                f'{len(jax.devices())}'
            )
        pytest.skip('needs the 8-device virtual mesh (CPU conftest mode)')
    return make_mesh()


class TestShardedFit:
    def test_sharded_matches_unsharded(self, smpl_model, mesh):
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.parallel import make_sharded_fit_fn, shard_batch

        fitter = BodyFitter(smpl_model)
        pose, betas, trans = random_params(16, seed=60, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv = np.asarray(res['vertices'])
        tj = np.asarray(res['joints'])

        fit_fn = make_sharded_fit_fn(
            fitter,
            mesh,
            num_iter=2,
            beta_regularizer=0.0,
            requested_keys=('pose_rotvecs', 'shape_betas'),
        )
        tv_sharded, tj_sharded = shard_batch((tv, tj), mesh)
        sharded = fit_fn(tv_sharded, tj_sharded)

        plain = fitter.fit(
            tv, tj, num_iter=2, beta_regularizer=0.0,
            requested_keys=('pose_rotvecs', 'shape_betas'),
        )
        # Sharding changes f32 reduction order slightly.
        np.testing.assert_allclose(
            np.asarray(sharded['shape_betas']),
            np.asarray(plain['shape_betas']),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(sharded['trans']), np.asarray(plain['trans']), atol=5e-4
        )

    def test_share_beta_cross_device(self, smpl_model, mesh):
        """share_beta couples all instances: the Gramian sum becomes an
        all-reduce across the 8 devices. Betas must be identical batch-wide."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.parallel import make_sharded_fit_fn, shard_batch

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(61)
        pose = rng.normal(0, 0.1, (16, 72)).astype(np.float32)
        betas = np.broadcast_to(
            rng.normal(0, 1, (1, 10)).astype(np.float32), (16, 10)
        ).copy()
        trans = rng.normal(0, 0.5, (16, 3)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = shard_batch(
            (np.asarray(res['vertices']), np.asarray(res['joints'])), mesh
        )

        fit_fn = make_sharded_fit_fn(
            fitter,
            mesh,
            num_iter=2,
            beta_regularizer=0.0,
            share_beta=True,
            requested_keys=('shape_betas',),
        )
        out = fit_fn(tv, tj)
        fit_betas = np.asarray(out['shape_betas'])
        assert np.all(np.std(fit_betas, axis=0) < 1e-6)

        plain = fitter.fit(
            np.asarray(res['vertices']), np.asarray(res['joints']),
            num_iter=2, beta_regularizer=0.0, share_beta=True,
            requested_keys=('shape_betas',),
        )
        np.testing.assert_allclose(
            fit_betas, np.asarray(plain['shape_betas']), atol=1e-4
        )

    def test_forward_sharded(self, smpl_model, mesh):
        from smplfitter_tpu.parallel import batch_sharding, shard_batch

        pose, betas, trans = random_params(16, seed=62)
        fwd = jax.jit(
            lambda p, b, t: smpl_model(pose_rotvecs=p, shape_betas=b, trans=t)
        )
        sharded_args = shard_batch((pose, betas, trans), mesh)
        out = fwd(*sharded_args)
        plain = fwd(pose, betas, trans)
        np.testing.assert_allclose(
            np.asarray(out['vertices']), np.asarray(plain['vertices']), atol=1e-5
        )
        # The output really is sharded over devices.
        assert len(out['vertices'].sharding.device_set) == 8

    def test_share_beta_batch512_stress(self, smpl_model, mesh):
        """Large-batch stress of the shared-Gramian all-reduce: 512 instances,
        64 per device. The reference documents chaotic amplification of
        reduction noise in the shared-shape pipeline (pt/bodyfitter.py:250-255
        there); measured drift here is ~3e-6 on betas / ~6e-5 on pose at batch
        512, so the asserted bounds (5e-5 / 5e-4) have 10x headroom without any
        f64 or compensated summation."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.parallel import make_sharded_fit_fn, shard_batch

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(63)
        B = 512
        pose = rng.normal(0, 0.2, (B, 72)).astype(np.float32)
        betas = np.broadcast_to(
            rng.normal(0, 1, (1, 10)).astype(np.float32), (B, 10)
        ).copy()
        trans = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])

        kw = dict(
            num_iter=3, beta_regularizer=0.0, share_beta=True,
            requested_keys=('shape_betas', 'pose_rotvecs'),
        )
        fit_fn = make_sharded_fit_fn(fitter, mesh, **kw)
        sharded = fit_fn(*shard_batch((tv, tj), mesh))
        plain = fitter.fit(tv, tj, **kw)

        sharded_betas = np.asarray(sharded['shape_betas'])
        assert np.all(np.std(sharded_betas, axis=0) < 1e-5)
        np.testing.assert_allclose(
            sharded_betas, np.asarray(plain['shape_betas']), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(sharded['pose_rotvecs']),
            np.asarray(plain['pose_rotvecs']),
            atol=5e-4,
        )

    def test_pad_to_mesh_non_divisible_batch(self, smpl_model, mesh):
        """Sharded batch ergonomics parity with single-chip fit: a global
        batch of 100 on 8 devices pads to 128 (ceil(100/8)=13 -> 16 per
        device) by last-instance replication with a zero batch_mask, which
        keeps share_beta's summed Gramian exact; outputs come back sliced
        to 100."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.parallel import (
            make_sharded_fit_fn,
            padded_global_batch,
        )

        assert padded_global_batch(100, 8) == 128
        # Tiny per-device shards pad up to the 8-wide kernel batch tile.
        assert padded_global_batch(16, 8) == 64
        assert padded_global_batch(128, 8) == 128
        assert padded_global_batch(2100, 8) == 8 * 384

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(66)
        B = 100
        pose = rng.normal(0, 0.1, (B, 72)).astype(np.float32)
        betas = np.broadcast_to(
            rng.normal(0, 1, (1, 10)).astype(np.float32), (B, 10)
        ).copy()
        trans = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])

        kw = dict(num_iter=2, beta_regularizer=0.0, share_beta=True,
                  requested_keys=('shape_betas', 'pose_rotvecs'))
        out = make_sharded_fit_fn(fitter, mesh, **kw)(tv, tj)
        assert out['shape_betas'].shape[0] == B
        assert out['pose_rotvecs'].shape[0] == B

        plain = fitter.fit(tv, tj, **kw)
        # The padded lanes enter the shared sums with weight 0, so the shared
        # betas must match the unsharded (unpadded) fit.
        sharded_betas = np.asarray(out['shape_betas'])
        assert np.all(np.std(sharded_betas, axis=0) < 1e-5)
        np.testing.assert_allclose(
            sharded_betas, np.asarray(plain['shape_betas']), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out['pose_rotvecs']),
            np.asarray(plain['pose_rotvecs']),
            atol=5e-4,
        )

    def test_gspmd_method_matches(self, smpl_model, mesh):
        """The plain GSPMD jit variant (XLA-derived all-reduce) still works."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.parallel import make_sharded_fit_fn, shard_batch

        fitter = BodyFitter(smpl_model)
        pose, betas, trans = random_params(16, seed=64, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        kw = dict(num_iter=2, beta_regularizer=0.0, share_beta=True,
                  requested_keys=('shape_betas',))
        out = make_sharded_fit_fn(fitter, mesh, method='gspmd', **kw)(
            *shard_batch((tv, tj), mesh)
        )
        plain = fitter.fit(tv, tj, **kw)
        np.testing.assert_allclose(
            np.asarray(out['shape_betas']), np.asarray(plain['shape_betas']),
            atol=5e-4,
        )

    def test_shard_map_kernel_path(self, smpl_model, mesh):
        """The fused kernels inside shard_map (interpret mode): each device
        traces its LOCAL batch (16 per device, kernel-eligible) and the
        share_beta psum crosses shards."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels
        from smplfitter_tpu.parallel import make_sharded_fit_fn, shard_batch

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(65)
        B = 128
        pose = rng.normal(0, 0.1, (B, 72)).astype(np.float32)
        betas = np.broadcast_to(
            rng.normal(0, 1, (1, 10)).astype(np.float32), (B, 10)
        ).copy()
        trans = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        kw = dict(num_iter=2, beta_regularizer=0.0, share_beta=True,
                  requested_keys=('shape_betas', 'pose_rotvecs'))
        plain = fitter.fit(tv, tj, **kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            out = make_sharded_fit_fn(fitter, mesh, **kw)(
                *shard_batch((tv, tj), mesh)
            )
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        sharded_betas = np.asarray(out['shape_betas'])
        assert np.all(np.std(sharded_betas, axis=0) < 1e-5)
        np.testing.assert_allclose(
            sharded_betas, np.asarray(plain['shape_betas']), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out['pose_rotvecs']), np.asarray(plain['pose_rotvecs']),
            atol=2e-3,
        )
