"""Forward-pass tests: shapes, semantics, and parity with the reference oracle."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import random_params


class TestForwardBasics:
    def test_shapes(self, smpl_model):
        pose, betas, trans = random_params(3)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        assert res['vertices'].shape == (3, smpl_model.num_vertices, 3)
        assert res['joints'].shape == (3, 24, 3)
        assert res['orientations'].shape == (3, 24, 3, 3)

    def test_joints_only(self, smpl_model):
        pose, betas, trans = random_params(2)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans,
                         return_vertices=False)
        assert 'vertices' not in res
        full = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        np.testing.assert_allclose(res['joints'], full['joints'], atol=1e-6)

    def test_rotation_input_equivalence(self, smpl_model):
        from smplfitter_tpu.ops import rotation as R

        pose, betas, trans = random_params(2, seed=1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        rel = np.asarray(R.rotvec2mat(pose.reshape(2, 24, 3)))
        res_rel = smpl_model(rel_rotmats=rel, shape_betas=betas, trans=trans)
        res_glob = smpl_model(
            glob_rotmats=res['orientations'], shape_betas=betas, trans=trans
        )
        np.testing.assert_allclose(res_rel['vertices'], res['vertices'], atol=1e-5)
        np.testing.assert_allclose(res_glob['vertices'], res['vertices'], atol=1e-5)

    def test_multiple_rotation_inputs_rejected(self, smpl_model):
        pose, betas, trans = random_params(2)
        with pytest.raises(ValueError, match='Only one rotation input'):
            smpl_model(pose_rotvecs=pose, rel_rotmats=np.zeros((2, 24, 3, 3)))

    def test_batch_size_mismatch_rejected(self, smpl_model):
        pose, betas, trans = random_params(2)
        with pytest.raises(ValueError, match='batch sizes'):
            smpl_model(pose_rotvecs=pose, shape_betas=betas[:1])

    def test_default_pose(self, smpl_model):
        betas = np.zeros((1, 10), np.float32)
        res = smpl_model(shape_betas=betas)
        assert np.all(np.isfinite(np.asarray(res['vertices'])))

    def test_single(self, smpl_model):
        pose, betas, trans = random_params(1, seed=2)
        single = smpl_model.single(
            pose_rotvecs=pose[0], shape_betas=betas[0], trans=trans[0]
        )
        batched = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        np.testing.assert_allclose(single['vertices'], batched['vertices'][0], atol=1e-6)

    def test_jit_compiles(self, smpl_model):
        import jax

        pose, betas, trans = random_params(2, seed=3)

        @jax.jit
        def fwd(p, b, t):
            return smpl_model(pose_rotvecs=p, shape_betas=b, trans=t)

        res = fwd(pose, betas, trans)
        eager = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        np.testing.assert_allclose(res['vertices'], eager['vertices'], atol=1e-6)

    def test_kid_factor(self, smpl_model):
        pose, betas, trans = random_params(2, seed=4)
        kid = np.array([0.5, 1.0], np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans,
                         kid_factor=kid)
        res0 = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        assert not np.allclose(res['vertices'], res0['vertices'], atol=1e-4)


class TestForwardParity:
    """Bit-level parity (within f32 tolerance) against the reference NumPy backend."""

    def test_forward_matches_reference(self, smpl_model, reference_np):
        pose, betas, trans = random_params(4, seed=5)
        ref_bm = reference_np.BodyModel('smpl', 'neutral')
        ref = ref_bm(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        ours = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        np.testing.assert_allclose(
            np.asarray(ours['vertices']), ref['vertices'], atol=2e-6
        )
        np.testing.assert_allclose(np.asarray(ours['joints']), ref['joints'], atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(ours['orientations']), ref['orientations'], atol=2e-6
        )

    def test_kid_matches_reference(self, smpl_model, reference_np):
        pose, betas, trans = random_params(2, seed=6)
        kid = np.array([0.3, 0.9], np.float32)
        ref_bm = reference_np.BodyModel('smpl', 'neutral')
        ref = ref_bm(pose_rotvecs=pose, shape_betas=betas, trans=trans, kid_factor=kid)
        ours = smpl_model(
            pose_rotvecs=pose, shape_betas=betas, trans=trans, kid_factor=kid
        )
        np.testing.assert_allclose(
            np.asarray(ours['vertices']), ref['vertices'], atol=2e-6
        )

    def test_rototranslate_matches_reference(self, smpl_model, reference_np):
        from smplfitter_tpu.ops import rotation as R

        pose, betas, trans = random_params(1, seed=7)
        rotmat = np.asarray(R.rotvec2mat(np.array([0.1, 0.4, -0.2], np.float32)))
        t = np.array([0.3, -0.1, 0.2], np.float32)
        ref_bm = reference_np.BodyModel('smpl', 'neutral')
        ref_pose, ref_trans = ref_bm.rototranslate(
            rotmat, t, pose_rotvecs=pose[0], shape_betas=betas[0], trans=trans[0]
        )
        our_pose, our_trans = smpl_model.rototranslate(
            rotmat, t, pose_rotvecs=pose[0], shape_betas=betas[0], trans=trans[0]
        )
        np.testing.assert_allclose(np.asarray(our_pose), ref_pose, atol=1e-5)
        np.testing.assert_allclose(np.asarray(our_trans), ref_trans, atol=1e-5)


class TestModelStructure:
    def test_constants(self, smpl_model):
        assert smpl_model.num_joints == 24
        assert smpl_model.num_betas == 10
        assert smpl_model.joint_names[0] == 'pelvis'
        assert len(smpl_model.kintree_parents) == 24

    def test_smplx_loads(self, body_models_dir):
        from smplfitter_tpu import BodyModel

        bm = BodyModel('smplx', 'neutral')
        assert bm.num_joints == 55
        res = bm(
            pose_rotvecs=np.zeros((1, 55 * 3), np.float32),
            shape_betas=np.zeros((1, 16), np.float32),
        )
        assert np.all(np.isfinite(np.asarray(res['vertices'])))

    def test_smplh16_loads(self, body_models_dir):
        from smplfitter_tpu import BodyModel

        bm = BodyModel('smplh16', 'neutral')
        assert bm.num_joints == 52

    def test_fewer_betas(self, body_models_dir):
        from smplfitter_tpu import BodyModel

        bm = BodyModel('smpl', 'neutral', num_betas=5)
        assert bm.num_betas == 5
        res = bm(
            pose_rotvecs=np.zeros((1, 72), np.float32),
            shape_betas=np.ones((1, 5), np.float32),
        )
        assert np.all(np.isfinite(np.asarray(res['vertices'])))
