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

    def test_fit_uses_sequential_adjustment(self, mano_model):
        """MANO is not smpl-family: every part is adjustable and part joint
        counts differ, so the level-batched final adjustment is unsupported —
        the sequential per-joint fallback must run."""
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(mano_model)
        assert not fitter.plan.leveladj_supported
        assert fitter.plan.adjustable_parts == tuple(range(16))

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
