"""Application-layer tests: converter, flipper, hand replacer, Adam refiner."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import random_params


@pytest.fixture(scope='session')
def smplx_model(body_models_dir):
    from smplfitter_tpu import BodyModel

    return BodyModel('smplx', 'neutral')


class TestConverter:
    def test_roundtrip_smpl_smplx_smpl(self, smpl_model, smplx_model):
        """SMPL -> SMPL-X -> SMPL vertex round trip (reference analogue:
        tests/test_converter_common.py there)."""
        from smplfitter_tpu import BodyConverter

        conv = BodyConverter(smpl_model, smplx_model)
        conv_back = BodyConverter(smplx_model, smpl_model)

        pose, betas, trans = random_params(2, seed=70, pose_std=0.1)
        out = conv.convert(pose, betas, trans, num_iter=2)
        back = conv_back.convert(
            out['pose_rotvecs'], out['shape_betas'], out['trans'], num_iter=2
        )

        orig = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        rec = smpl_model(
            pose_rotvecs=back['pose_rotvecs'],
            shape_betas=back['shape_betas'],
            trans=back['trans'],
        )
        err = np.linalg.norm(
            np.asarray(orig['vertices']) - np.asarray(rec['vertices']), axis=-1
        ).mean()
        # Synthetic correspondences are nearest-neighbor (not true barycentric
        # on a shared surface), so the bound is looser than the real-data 20mm.
        assert err < 0.1, f'round-trip vertex error {err}'

    def test_convert_vertices_jit(self, smpl_model, smplx_model):
        import jax

        from smplfitter_tpu import BodyConverter

        conv = BodyConverter(smpl_model, smplx_model)
        verts = np.asarray(
            smpl_model(
                pose_rotvecs=np.zeros((2, 72), np.float32),
                shape_betas=np.zeros((2, 10), np.float32),
            )['vertices']
        )
        out = jax.jit(conv.convert_vertices)(verts)
        assert out.shape == (2, smplx_model.num_vertices, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_same_topology_identity(self, smpl_model, body_models_dir):
        from smplfitter_tpu import BodyConverter, BodyModel

        smplh = BodyModel('smplh16', 'neutral')
        conv = BodyConverter(smpl_model, smplh)
        verts = np.random.default_rng(0).normal(
            size=(2, smpl_model.num_vertices, 3)
        ).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(conv.convert_vertices(verts)), verts)

    def test_known_shape_and_pose_paths(self, smpl_model, smplx_model):
        from smplfitter_tpu import BodyConverter

        conv = BodyConverter(smpl_model, smplx_model)
        pose, betas, trans = random_params(2, seed=71, pose_std=0.1)
        known_pose = np.zeros((2, smplx_model.num_joints * 3), np.float32)
        out = conv.convert(pose, betas, trans, known_output_pose_rotvecs=known_pose)
        assert out['shape_betas'].shape[0] == 2
        known_shape = np.zeros((2, 16), np.float32)
        out2 = conv.convert(pose, betas, trans, known_output_shape_betas=known_shape)
        assert out2['pose_rotvecs'].shape == (2, smplx_model.num_joints * 3)


class TestFlipper:
    def test_flip_consistency(self, smpl_model):
        """Forward(flipped params) must match the mirrored input mesh."""
        from smplfitter_tpu import BodyFlipper

        flipper = BodyFlipper(smpl_model)
        pose, betas, trans = random_params(2, seed=72, pose_std=0.1)
        flipped = flipper.flip(pose, betas, trans, num_iter=2)
        res_flip = smpl_model(
            pose_rotvecs=flipped['pose_rotvecs'],
            shape_betas=flipped['shape_betas'],
            trans=flipped['trans'],
        )
        inp = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        target = np.asarray(flipper.flip_vertices(inp['vertices']))
        err = np.linalg.norm(
            target - np.asarray(res_flip['vertices']), axis=-1
        ).mean()
        # Looser than the real-data 1e-2: synthetic bodies are not symmetric,
        # so the mirror correspondence itself carries error.
        assert err < 0.15, f'flip consistency error {err}'

    def test_naive_flip_rotvecs_involution(self, smpl_model):
        from smplfitter_tpu import BodyFlipper

        flipper = BodyFlipper(smpl_model)
        pose, _, _ = random_params(2, seed=73)
        twice = flipper.naive_flip_rotvecs(flipper.naive_flip_rotvecs(pose))
        np.testing.assert_allclose(np.asarray(twice), pose, atol=1e-6)


class TestHandReplacer:
    def test_replace_hand_runs(self, body_models_dir, smpl_model):
        from smplfitter_tpu import HandReplacer, BodyModel

        smplh = BodyModel('smplh16', 'neutral')
        rng = np.random.default_rng(74)
        hand_pose = rng.normal(0, 0.2, (52 * 3,)).astype(np.float32)
        replacer = HandReplacer(hand_pose, smplh_model=smplh)
        pose = rng.normal(0, 0.1, (2, 52 * 3)).astype(np.float32)
        betas = rng.normal(0, 1, (2, 16)).astype(np.float32)
        res = smplh(pose_rotvecs=pose, shape_betas=betas)
        out = replacer.replace_hand(res['vertices'])
        assert out.shape == res['vertices'].shape
        assert np.all(np.isfinite(np.asarray(out)))
        # Body region (far from hands) must be (nearly) untouched.
        mask = np.asarray(replacer.hand_mix_weight) == 0
        if mask.any():
            np.testing.assert_allclose(
                np.asarray(out)[:, mask], np.asarray(res['vertices'])[:, mask],
                atol=1e-6,
            )


class TestFitterOpt:
    def test_refinement_improves(self, smpl_model):
        from smplfitter_tpu import BodyFitterOpt

        opt = BodyFitterOpt(smpl_model)
        pose, betas, trans = random_params(2, seed=75, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])

        def v2v(fit):
            rec = smpl_model(
                pose_rotvecs=fit['pose_rotvecs'],
                shape_betas=fit['shape_betas'],
                trans=fit['trans'],
            )
            return np.linalg.norm(
                np.asarray(rec['vertices']) - tv, axis=-1
            ).mean()

        base = opt.fit(tv, tj, num_iter=2, beta_regularizer=0.0, refine_steps=0)
        refined = opt.fit(
            tv, tj, num_iter=2, beta_regularizer=0.0, refine_steps=60,
            refine_lr=0.01,
        )
        assert v2v(refined) < v2v(base) * 0.9, (v2v(refined), v2v(base))

    def test_refine_jits(self, smpl_model):
        import jax

        from smplfitter_tpu import BodyFitterOpt

        opt = BodyFitterOpt(smpl_model)
        pose, betas, trans = random_params(2, seed=76, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)

        fit_fn = jax.jit(
            lambda tv, tj: opt.fit(
                tv, tj, num_iter=2, beta_regularizer=0.0, refine_steps=10
            )
        )
        out = fit_fn(res['vertices'], res['joints'])
        assert np.all(np.isfinite(np.asarray(out['pose_rotvecs'])))


class TestFlipperOpt:
    def test_flip_with_refinement(self, smpl_model):
        from smplfitter_tpu import BodyFlipperOpt

        flipper = BodyFlipperOpt(smpl_model)
        pose, betas, trans = random_params(2, seed=77, pose_std=0.1)
        base = flipper.flip(pose, betas, trans, num_iter=2, refine_steps=0)
        refined = flipper.flip(pose, betas, trans, num_iter=2, refine_steps=40,
                               refine_lr=0.01)

        inp = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        target = np.asarray(flipper.flipper.flip_vertices(inp['vertices']))

        def v2v(fit):
            rec = smpl_model(
                pose_rotvecs=fit['pose_rotvecs'],
                shape_betas=fit['shape_betas'],
                trans=fit['trans'],
            )
            return np.linalg.norm(np.asarray(rec['vertices']) - target, axis=-1).mean()

        assert v2v(refined) <= v2v(base) * 1.02
        assert np.all(np.isfinite(np.asarray(refined['pose_rotvecs'])))
