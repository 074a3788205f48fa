"""Behavioral-contract edge cases, pinned against the reference oracle."""

from __future__ import annotations

import numpy as np

from conftest import random_params


class TestWeightSemantics:
    def test_joint_weights_without_vertex_weights(self, smpl_model, reference_np):
        """With joints given, the shape solve only honors weights when BOTH
        vertex and joint weights are supplied (reference semantics) — but the
        rotation fits use joint_weights regardless. Pin exact parity."""
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(smpl_model)
        ref_fitter = reference_np.BodyFitter(reference_np.BodyModel('smpl', 'neutral'))
        pose, betas, trans = random_params(2, seed=110, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        rng = np.random.default_rng(111)
        jw = rng.uniform(0.2, 2.0, (2, 24)).astype(np.float32)

        kwargs = dict(num_iter=2, beta_regularizer=0.0,
                      requested_keys=['shape_betas', 'trans'])
        ours = fitter.fit(tv, tj, joint_weights=jw, **kwargs)
        ref = ref_fitter.fit(target_vertices=tv, target_joints=tj,
                             joint_weights=jw, **kwargs)
        np.testing.assert_allclose(
            np.asarray(ours['shape_betas']), ref['shape_betas'], atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(ours['trans']), ref['trans'], atol=2e-3)

    def test_both_weights(self, smpl_model, reference_np):
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(smpl_model)
        ref_fitter = reference_np.BodyFitter(reference_np.BodyModel('smpl', 'neutral'))
        pose, betas, trans = random_params(2, seed=112, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        rng = np.random.default_rng(113)
        vw = rng.uniform(0.2, 2.0, (2, smpl_model.num_vertices)).astype(np.float32)
        jw = rng.uniform(0.2, 2.0, (2, 24)).astype(np.float32)

        kwargs = dict(num_iter=2, beta_regularizer=0.0,
                      requested_keys=['shape_betas', 'trans'])
        ours = fitter.fit(tv, tj, vertex_weights=vw, joint_weights=jw, **kwargs)
        ref = ref_fitter.fit(target_vertices=tv, target_joints=tj,
                             vertex_weights=vw, joint_weights=jw, **kwargs)
        # f32 reduction-order divergence accumulates slightly more on the
        # weighted (general-solve) path.
        np.testing.assert_allclose(
            np.asarray(ours['shape_betas']), ref['shape_betas'], atol=5e-3
        )
        np.testing.assert_allclose(np.asarray(ours['trans']), ref['trans'], atol=2e-3)


class TestRototranslate:
    def test_pre_translate(self, smpl_model, reference_np):
        from smplfitter_tpu.ops import rotation as R

        pose, betas, trans = random_params(1, seed=114)
        rotmat = np.asarray(R.rotvec2mat(np.array([0.3, -0.2, 0.5], np.float32)))
        t = np.array([0.1, 0.2, -0.3], np.float32)
        ref_bm = reference_np.BodyModel('smpl', 'neutral')
        ref_pose, ref_trans = ref_bm.rototranslate(
            rotmat, t, pose_rotvecs=pose[0], shape_betas=betas[0], trans=trans[0],
            post_translate=False,
        )
        our_pose, our_trans = smpl_model.rototranslate(
            rotmat, t, pose_rotvecs=pose[0], shape_betas=betas[0], trans=trans[0],
            post_translate=False,
        )
        np.testing.assert_allclose(np.asarray(our_pose), ref_pose, atol=1e-5)
        np.testing.assert_allclose(np.asarray(our_trans), ref_trans, atol=1e-5)

    def test_forward_consistency(self, smpl_model):
        """M(new_params) must equal R @ M(old_params) + t."""
        from smplfitter_tpu.ops import rotation as R

        pose, betas, trans = random_params(1, seed=115, pose_std=0.2)
        rotmat = np.asarray(R.rotvec2mat(np.array([0.2, 0.7, -0.1], np.float32)))
        t = np.array([0.5, -0.2, 0.1], np.float32)
        new_pose, new_trans = smpl_model.rototranslate(
            rotmat, t, pose_rotvecs=pose[0], shape_betas=betas[0], trans=trans[0]
        )
        orig = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        moved = smpl_model(
            pose_rotvecs=np.asarray(new_pose)[None],
            shape_betas=betas,
            trans=np.asarray(new_trans)[None],
        )
        expected = np.asarray(orig['vertices']) @ rotmat.T + t
        np.testing.assert_allclose(
            np.asarray(moved['vertices']), expected, atol=1e-5
        )


class TestConverterKid:
    def test_convert_with_kid(self, smpl_model, body_models_dir):
        from smplfitter_tpu import BodyConverter, BodyModel

        smplx = BodyModel('smplx', 'neutral')
        conv = BodyConverter(smpl_model, smplx)
        pose, betas, trans = random_params(2, seed=116, pose_std=0.1)
        kid = np.array([0.3, 0.7], np.float32)
        out = conv.convert(pose, betas, trans, kid_factor=kid, num_iter=1)
        assert 'kid_factor' in out
        assert np.all(np.isfinite(np.asarray(out['kid_factor'])))
