"""Model-variant tests: MANO (non-smpl-family sequential paths), SMPL-X fits,
smplh16 fitting — exercising part-bucket structures beyond SMPL."""

from __future__ import annotations

import os.path as osp

import numpy as np
import pytest


@pytest.fixture(scope='module')
def mano_model(body_models_dir):
    from smplfitter_tpu import BodyModel
    from smplfitter_tpu.utils import synthetic

    synthetic.write_model_files(body_models_dir, 'mano', num_vertices=240, num_betas=10)
    return BodyModel('mano', 'neutral')


class TestMano:
    def test_structure(self, mano_model):
        assert mano_model.num_joints == 16
        assert mano_model.joint_names[0] == 'wrist'

    def test_forward(self, mano_model):
        rng = np.random.default_rng(90)
        pose = rng.normal(0, 0.1, (2, 48)).astype(np.float32)
        betas = rng.normal(0, 1, (2, 10)).astype(np.float32)
        res = mano_model(pose_rotvecs=pose, shape_betas=betas)
        assert np.all(np.isfinite(np.asarray(res['vertices'])))

    def test_fit_bucketed_adjustment(self, mano_model):
        """MANO is not smpl-family: every part is adjustable (including the
        root/wrist) and part joint counts differ — the final adjustment must
        schedule per-level equal-joint-count buckets covering all 16 parts."""
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(mano_model)
        assert fitter.plan.adjustable_parts == tuple(range(16))
        buckets = fitter.plan.adj_level_buckets
        scheduled = sorted(
            i for entry in buckets for bucket in entry for i in bucket
        )
        assert scheduled == list(range(16))
        assert buckets[0] == ((0,),)  # the root is its own schedule entry
        # buckets within one level must have uniform joint counts
        for entry in buckets:
            for bucket in entry:
                counts = {
                    len(fitter.plan.children_and_self[i]) for i in bucket
                }
                assert len(counts) == 1

        rng = np.random.default_rng(91)
        pose = rng.normal(0, 0.1, (2, 48)).astype(np.float32)
        betas = rng.normal(0, 1, (2, 10)).astype(np.float32)
        res = mano_model(pose_rotvecs=pose, shape_betas=betas)
        fit = fitter.fit(
            res['vertices'], res['joints'], num_iter=3, beta_regularizer=0.0,
            final_adjust_rots=True,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        rec = mano_model(
            pose_rotvecs=fit['pose_rotvecs'],
            shape_betas=fit['shape_betas'],
            trans=fit['trans'],
        )
        err = np.linalg.norm(
            np.asarray(rec['vertices']) - np.asarray(res['vertices']), axis=-1
        ).mean()
        assert err < 5e-2, f'MANO fit error {err}'

    def test_fit_matches_reference(self, mano_model, reference_np):
        ref_bm = reference_np.BodyModel('mano', 'neutral')
        ref_fitter = reference_np.BodyFitter(ref_bm)
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(mano_model)
        rng = np.random.default_rng(92)
        pose = rng.normal(0, 0.1, (2, 48)).astype(np.float32)
        betas = rng.normal(0, 1, (2, 10)).astype(np.float32)
        res = mano_model(pose_rotvecs=pose, shape_betas=betas)
        tv = np.asarray(res['vertices'])
        tj = np.asarray(res['joints'])
        kwargs = dict(num_iter=2, beta_regularizer=0.0,
                      requested_keys=['shape_betas', 'trans'])
        ours = fitter.fit(tv, tj, **kwargs)
        ref = ref_fitter.fit(tv, tj, **kwargs)
        # Tiny hand parts have near-degenerate covariances; the analytic
        # projection and the reference's SVD diverge slightly there.
        np.testing.assert_allclose(
            np.asarray(ours['shape_betas']), ref['shape_betas'], atol=2e-2
        )
        np.testing.assert_allclose(np.asarray(ours['trans']), ref['trans'], atol=2e-3)


class TestSmplx:
    def test_fit_roundtrip(self, body_models_dir):
        from smplfitter_tpu import BodyModel, BodyFitter

        bm = BodyModel('smplx', 'neutral')
        fitter = BodyFitter(bm)
        rng = np.random.default_rng(93)
        pose = rng.normal(0, 0.05, (2, 55 * 3)).astype(np.float32)
        betas = rng.normal(0, 1, (2, 16)).astype(np.float32)
        res = bm(pose_rotvecs=pose, shape_betas=betas)
        fit = fitter.fit(
            res['vertices'], res['joints'], num_iter=3, beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        rec = bm(
            pose_rotvecs=fit['pose_rotvecs'],
            shape_betas=fit['shape_betas'],
            trans=fit['trans'],
        )
        err = np.linalg.norm(
            np.asarray(rec['vertices']) - np.asarray(res['vertices']), axis=-1
        ).mean()
        assert err < 5e-2, f'SMPL-X fit error {err}'

    def test_weighted_lm_fit_large_j(self, body_models_dir):
        """Per-call weighted kernel path on SMPL-X (J=55 exercises the
        large-J XLA gram assembly alongside the wgram kernel) vs the
        batch-major weighted solve."""
        from smplfitter_tpu import BodyModel, BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        bm = BodyModel('smplx', 'neutral')
        fitter = BodyFitter(bm)
        rng = np.random.default_rng(94)
        B = 8
        pose = rng.normal(0, 0.05, (B, 55 * 3)).astype(np.float32)
        betas = rng.normal(0, 1, (B, 16)).astype(np.float32)
        res = bm(pose_rotvecs=pose, shape_betas=betas)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        vw = (0.2 + rng.random((B, bm.num_vertices))).astype(np.float32)
        jw = (0.2 + rng.random((B, bm.num_joints))).astype(np.float32)
        kw = dict(
            target_joints=tj, vertex_weights=vw, joint_weights=jw,
            num_iter=2, beta_regularizer=0.5,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
        ref = fitter.fit(tv, **kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = fitter.fit(tv, **kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        # f32 reduction-order noise is chaotically amplified by the iterative
        # fit at isolated joints (the reference documents the same effect,
        # pt/bodyfitter.py:250-255 there) — measured 4.4e-3 max on one of
        # 1320 pose entries at J=55.
        for k, tol in (('shape_betas', 3e-3), ('trans', 3e-3),
                       ('pose_rotvecs', 8e-3)):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=tol, err_msg=k
            )

    def test_known_shape_lm_large_j(self, body_models_dir):
        """Known-shape lane-major path on SMPL-X vs the general solve."""
        from smplfitter_tpu import BodyModel, BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        bm = BodyModel('smplx', 'neutral')
        fitter = BodyFitter(bm)
        rng = np.random.default_rng(95)
        B = 8
        pose = rng.normal(0, 0.05, (B, 55 * 3)).astype(np.float32)
        betas = rng.normal(0, 1, (B, 16)).astype(np.float32)
        res = bm(pose_rotvecs=pose, shape_betas=betas)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        kw = dict(
            shape_betas=betas, target_vertices=tv, target_joints=tj,
            num_iter=2, requested_keys=['pose_rotvecs'],
        )
        ref = fitter.fit_with_known_shape(**kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = fitter.fit_with_known_shape(**kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(got['trans']), np.asarray(ref['trans']), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(got['pose_rotvecs']), np.asarray(ref['pose_rotvecs']),
            atol=3e-3,
        )


class TestGenderedFiles:
    def test_female_male(self, body_models_dir):
        from smplfitter_tpu import BodyModel
        from smplfitter_tpu.utils import synthetic

        synthetic.write_model_files(
            body_models_dir, 'smpl', num_vertices=432,
            genders=('female', 'male'),
        )
        for gender in ('female', 'male'):
            bm = BodyModel('smpl', gender)
            assert bm.gender == gender
