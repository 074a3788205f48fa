"""Fitter tests: round-trip recovery, flag variants, parity with the reference.

Mirrors the reference test strategy (tests/test_fitter_common.py there): generate
on-manifold targets with the model's own forward pass, fit, forward again, and
check reconstruction error — no stored fixtures needed.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import random_params


@pytest.fixture(scope='session')
def smpl_fitter(smpl_model):
    from smplfitter_tpu import BodyFitter

    return BodyFitter(smpl_model)


def _roundtrip_errors(model, fit, res):
    res_fit = model(
        pose_rotvecs=fit['pose_rotvecs'],
        shape_betas=fit['shape_betas'],
        trans=fit['trans'],
        kid_factor=fit.get('kid_factor'),
    )
    verts_err = np.linalg.norm(
        np.asarray(res['vertices']) - np.asarray(res_fit['vertices']), axis=-1
    )
    joints_err = np.linalg.norm(
        np.asarray(res['joints']) - np.asarray(res_fit['joints']), axis=-1
    )
    return float(np.mean(verts_err)), float(np.mean(joints_err))


class TestFitBasic:
    def test_roundtrip(self, smpl_model, smpl_fitter):
        pose, betas, trans = random_params(2, seed=42, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        fit = smpl_fitter.fit(
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            num_iter=3,
            beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        v_err, j_err = _roundtrip_errors(smpl_model, fit, res)
        # Threshold calibrated to the reference fitter on the same synthetic
        # model (it achieves the identical error; see TestFitterParity).
        assert v_err < 2.5e-2, f'vertex error {v_err}'
        assert j_err < 2.5e-2, f'joint error {j_err}'

    def test_roundtrip_vertices_only(self, smpl_model, smpl_fitter):
        pose, betas, trans = random_params(2, seed=43, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        fit = smpl_fitter.fit(
            target_vertices=res['vertices'],
            num_iter=3,
            beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        v_err, _ = _roundtrip_errors(smpl_model, fit, res)
        # Joint regressor on the synthetic model is approximate; looser bound.
        assert v_err < 5e-2, f'vertex error {v_err}'

    def test_share_beta(self, smpl_model, smpl_fitter):
        rng = np.random.default_rng(44)
        pose = rng.normal(0, 0.1, (4, 72)).astype(np.float32)
        betas = np.broadcast_to(
            rng.normal(0, 1, (1, 10)).astype(np.float32), (4, 10)
        ).copy()
        trans = rng.normal(0, 0.5, (4, 3)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        fit = smpl_fitter.fit(
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            num_iter=3,
            beta_regularizer=0.0,
            share_beta=True,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        beta_std = np.std(np.asarray(fit['shape_betas']), axis=0)
        assert np.all(beta_std < 1e-6), 'betas must be identical across batch'
        v_err, _ = _roundtrip_errors(smpl_model, fit, res)
        assert v_err < 5e-2  # reference achieves 2.96e-2 on this synthetic model

    def test_requested_keys_vertices(self, smpl_model, smpl_fitter):
        pose, betas, trans = random_params(2, seed=45, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        fit = smpl_fitter.fit(
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            num_iter=2,
            beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas', 'vertices', 'joints'],
        )
        # Returned vertices/joints must be the forward pass of the returned params.
        res_fit = smpl_model(
            pose_rotvecs=fit['pose_rotvecs'],
            shape_betas=fit['shape_betas'],
            trans=fit['trans'],
        )
        np.testing.assert_allclose(
            np.asarray(fit['vertices']), np.asarray(res_fit['vertices']), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(fit['joints']), np.asarray(res_fit['joints']), atol=1e-3
        )

    def test_jit(self, smpl_model, smpl_fitter):
        import jax

        pose, betas, trans = random_params(2, seed=46, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)

        @jax.jit
        def fit_fn(tv, tj):
            return smpl_fitter.fit(
                tv, tj, num_iter=3, beta_regularizer=0.0,
                requested_keys=['pose_rotvecs', 'shape_betas'],
            )

        fit = fit_fn(res['vertices'], res['joints'])
        eager = smpl_fitter.fit(
            res['vertices'], res['joints'], num_iter=3, beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        # jit and eager pick different contraction orders for the fused
        # Gramian GEMM; f32 reduction-order drift is ~1e-4.
        np.testing.assert_allclose(
            np.asarray(fit['shape_betas']), np.asarray(eager['shape_betas']), atol=3e-4
        )
        v_err, _ = _roundtrip_errors(smpl_model, fit, res)
        assert v_err < 5e-2


class TestFitScale:
    """Scale estimation. On the synthetic model the random shape space can
    partly absorb uniform scale, so absolute scale recovery (a real-SMPL
    property, tested env-gated elsewhere) is not identifiable here — instead we
    check exact parity with the reference fitter and that the scaled
    reconstruction matches the target as well as the reference's does."""

    @pytest.mark.parametrize('mode', ['scale_target', 'scale_fit'])
    def test_scale_parity(self, smpl_model, smpl_fitter, reference_np, mode):
        ref_fitter = reference_np.BodyFitter(reference_np.BodyModel('smpl', 'neutral'))
        pose, betas, trans = random_params(2, seed=47, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        factor = 1.1
        tv = np.asarray(res['vertices']) * factor
        tj = np.asarray(res['joints']) * factor
        kwargs = dict(
            num_iter=3,
            beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas', 'scale_corr'],
            **{mode: True},
        )
        ours = smpl_fitter.fit(target_vertices=tv, target_joints=tj, **kwargs)
        ref = ref_fitter.fit(target_vertices=tv, target_joints=tj, **kwargs)
        np.testing.assert_allclose(
            np.asarray(ours['scale_corr']), ref['scale_corr'], atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(ours['shape_betas']), ref['shape_betas'], atol=5e-3
        )
        np.testing.assert_allclose(np.asarray(ours['trans']), ref['trans'], atol=2e-3)


class TestKnownPoseShape:
    def test_known_pose(self, smpl_model, smpl_fitter):
        pose, betas, trans = random_params(2, seed=49, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        fit = smpl_fitter.fit_with_known_pose(
            pose_rotvecs=pose,
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            beta_regularizer=0.0,
        )
        np.testing.assert_allclose(np.asarray(fit['shape_betas']), betas, atol=5e-2)
        res_fit = smpl_model(
            pose_rotvecs=pose, shape_betas=fit['shape_betas'], trans=fit['trans']
        )
        err = np.linalg.norm(
            np.asarray(res['vertices']) - np.asarray(res_fit['vertices']), axis=-1
        ).mean()
        assert err < 2.5e-2

    @pytest.mark.parametrize('has_joints', [False, True])
    @pytest.mark.parametrize('share_beta', [False, True])
    def test_known_pose_lm_matches_general(self, smpl_model, smpl_fitter,
                                           has_joints, share_beta):
        """The lane-major known-pose solve (forced-interpret kernels) vs the
        batch-major general solve."""
        from smplfitter_tpu.ops import lbs_kernels

        pose, betas, trans = random_params(8, seed=56, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        kw = dict(
            pose_rotvecs=pose,
            target_vertices=res['vertices'],
            target_joints=res['joints'] if has_joints else None,
            beta_regularizer=0.5,
            share_beta=share_beta,
        )
        ref = smpl_fitter.fit_with_known_pose(**kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = smpl_fitter.fit_with_known_pose(**kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(got['shape_betas']), np.asarray(ref['shape_betas']),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got['trans']), np.asarray(ref['trans']), atol=5e-4
        )

    @pytest.mark.parametrize('has_joints', [False, True])
    @pytest.mark.parametrize('final_adjust', [False, True])
    def test_known_shape_lm_matches_general(self, smpl_model, smpl_fitter,
                                            has_joints, final_adjust):
        """The lane-major known-shape solve (forced-interpret kernels) vs the
        batch-major general solve."""
        from smplfitter_tpu.ops import lbs_kernels

        pose, betas, trans = random_params(8, seed=58, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        kw = dict(
            shape_betas=betas,
            target_vertices=res['vertices'],
            target_joints=res['joints'] if has_joints else None,
            num_iter=2,
            final_adjust_rots=final_adjust,
            requested_keys=['pose_rotvecs'],
        )
        ref = smpl_fitter.fit_with_known_shape(**kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = smpl_fitter.fit_with_known_shape(**kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(got['trans']), np.asarray(ref['trans']), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(got['pose_rotvecs']), np.asarray(ref['pose_rotvecs']),
            atol=2e-3,
        )

    def test_known_shape_lm_warm_start(self, smpl_model, smpl_fitter):
        """initial_pose_rotvecs warm start: LM vs general."""
        from smplfitter_tpu.ops import lbs_kernels

        pose, betas, trans = random_params(8, seed=59, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        init = pose + np.random.RandomState(3).randn(*pose.shape).astype(
            np.float32
        ) * 0.05
        kw = dict(
            shape_betas=betas,
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            num_iter=1,
            initial_pose_rotvecs=init,
            requested_keys=['pose_rotvecs'],
        )
        ref = smpl_fitter.fit_with_known_shape(**kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = smpl_fitter.fit_with_known_shape(**kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(got['trans']), np.asarray(ref['trans']), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(got['pose_rotvecs']), np.asarray(ref['pose_rotvecs']),
            atol=2e-3,
        )

    def test_known_shape(self, smpl_model, smpl_fitter):
        pose, betas, trans = random_params(2, seed=50, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        fit = smpl_fitter.fit_with_known_shape(
            shape_betas=betas,
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            num_iter=3,
        )
        res_fit = smpl_model(
            pose_rotvecs=fit['pose_rotvecs'], shape_betas=betas, trans=fit['trans']
        )
        err = np.linalg.norm(
            np.asarray(res['vertices']) - np.asarray(res_fit['vertices']), axis=-1
        ).mean()
        assert err < 2.5e-2


class TestKid:
    def test_kid_roundtrip(self, smpl_model, body_models_dir):
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(smpl_model, enable_kid=True)
        pose, betas, trans = random_params(2, seed=51, pose_std=0.1)
        kid = np.array([0.4, 0.8], np.float32)
        res = smpl_model(
            pose_rotvecs=pose, shape_betas=betas, trans=trans, kid_factor=kid
        )
        fit = fitter.fit(
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            num_iter=3,
            beta_regularizer=0.0,
            kid_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        assert 'kid_factor' in fit
        v_err, _ = _roundtrip_errors(smpl_model, fit, res)
        assert v_err < 2.5e-2


class TestWarmStart:
    def test_initial_params(self, smpl_model, smpl_fitter):
        pose, betas, trans = random_params(2, seed=52, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        fit = smpl_fitter.fit(
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            num_iter=2,
            beta_regularizer=1e-2,
            beta_regularizer2=1e-2,
            initial_pose_rotvecs=pose,
            initial_shape_betas=betas,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        v_err, _ = _roundtrip_errors(smpl_model, fit, res)
        assert v_err < 2.5e-2


class TestWeights:
    def test_vertex_weights(self, smpl_model, smpl_fitter):
        pose, betas, trans = random_params(2, seed=53, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        vw = np.ones((2, smpl_model.num_vertices), np.float32)
        jw = np.ones((2, 24), np.float32)
        fit = smpl_fitter.fit(
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            vertex_weights=vw,
            joint_weights=jw,
            num_iter=3,
            beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        v_err, _ = _roundtrip_errors(smpl_model, fit, res)
        assert v_err < 2.5e-2


class TestFitterParity:
    """Direct output parity against the reference NumPy fitter on the same
    synthetic model and targets."""

    @pytest.fixture(scope='class')
    def ref_pair(self, reference_np):
        model = reference_np.BodyModel('smpl', 'neutral')
        fitter = reference_np.BodyFitter(model)
        return model, fitter

    def test_fit_outputs_match(self, smpl_model, smpl_fitter, ref_pair):
        ref_model, ref_fitter = ref_pair
        pose, betas, trans = random_params(2, seed=54, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv = np.asarray(res['vertices'])
        tj = np.asarray(res['joints'])
        kwargs = dict(
            num_iter=3,
            beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas', 'trans'],
        )
        ours = smpl_fitter.fit(target_vertices=tv, target_joints=tj, **kwargs)
        ref = ref_fitter.fit(target_vertices=tv, target_joints=tj, **kwargs)

        np.testing.assert_allclose(
            np.asarray(ours['shape_betas']), ref['shape_betas'], atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(ours['trans']), ref['trans'], atol=2e-3)
        # Compare poses through the forward pass (rotvec representation may
        # differ by 2pi-equivalent vectors).
        ours_fwd = smpl_model(
            pose_rotvecs=ours['pose_rotvecs'],
            shape_betas=ours['shape_betas'],
            trans=ours['trans'],
        )
        ref_fwd = ref_model(
            pose_rotvecs=ref['pose_rotvecs'],
            shape_betas=ref['shape_betas'],
            trans=ref['trans'],
        )
        err = np.linalg.norm(
            np.asarray(ours_fwd['vertices']) - ref_fwd['vertices'], axis=-1
        )
        assert err.mean() < 1e-3, f'fit-vs-reference v2v {err.mean()}'

    def test_known_pose_matches(self, smpl_model, smpl_fitter, ref_pair):
        ref_model, ref_fitter = ref_pair
        pose, betas, trans = random_params(2, seed=55, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv = np.asarray(res['vertices'])
        ours = smpl_fitter.fit_with_known_pose(
            pose_rotvecs=pose, target_vertices=tv, beta_regularizer=0.0
        )
        ref = ref_fitter.fit_with_known_pose(
            pose_rotvecs=pose, target_vertices=tv, beta_regularizer=0.0
        )
        np.testing.assert_allclose(
            np.asarray(ours['shape_betas']), ref['shape_betas'], atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(ours['trans']), ref['trans'], atol=2e-3)


class TestPerCallWeightedKernelPath:
    """Per-call (runtime, B-varying) vertex/joint weights on the lane-major
    kernel path — runtime-ω part sums + the weighted-Gramian solve
    (lbs_kernels.wgram_moments) — vs the batch-major general formulation."""

    def _targets_and_weights(self, smpl_model, seed=61):
        pose, betas, trans = random_params(8, seed=seed, pose_std=0.12)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        rng = np.random.RandomState(seed)
        vw = (0.2 + rng.rand(8, smpl_model.num_vertices)).astype(np.float32)
        jw = (0.2 + rng.rand(8, smpl_model.num_joints)).astype(np.float32)
        return np.asarray(res['vertices']), np.asarray(res['joints']), vw, jw

    @pytest.mark.parametrize(
        'case', ['joints_vw_jw', 'joints_vw_only', 'vw_no_joints', 'share_beta']
    )
    def test_weighted_lm_matches_general(self, smpl_model, smpl_fitter, case):
        from smplfitter_tpu.ops import lbs_kernels

        tv, tj, vw, jw = self._targets_and_weights(smpl_model)
        kw = dict(
            num_iter=2, beta_regularizer=0.5, final_adjust_rots=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
        if case == 'joints_vw_jw':
            kw.update(target_joints=tj, vertex_weights=vw, joint_weights=jw)
        elif case == 'joints_vw_only':
            # Rotations weighted; the solve stays UNWEIGHTED per the
            # reference both-or-neither rule.
            kw.update(target_joints=tj, vertex_weights=vw)
        elif case == 'vw_no_joints':
            kw.update(vertex_weights=vw)
        else:
            kw.update(target_joints=tj, vertex_weights=vw, joint_weights=jw,
                      share_beta=True)
        ref = smpl_fitter.fit(tv, **kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = smpl_fitter.fit(tv, **kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        for k in ('shape_betas', 'trans', 'pose_rotvecs'):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=2e-3, err_msg=k
            )

    def test_weighted_wgram_solve_unit(self, smpl_model, smpl_fitter):
        """fit_shape_wgram_lm vs the streamed weighted solve on one set of
        fixed rotations (covers kid-free solve pieces directly)."""
        import jax.numpy as jnp

        from smplfitter_tpu.models import bodyfitter as bf
        from smplfitter_tpu.models.bodymodel import fk_rotations
        from smplfitter_tpu.models.shape_gram import fit_shape_wgram_lm
        from smplfitter_tpu.ops import lbs_kernels
        from smplfitter_tpu.ops import rotation as rot_ops

        tv, tj, vw, jw = self._targets_and_weights(smpl_model, seed=62)
        bm, plan, gram = smpl_model.data, smpl_fitter.plan, smpl_fitter.gram
        B = tv.shape[0]
        pose, _, _ = random_params(B, seed=62, pose_std=0.12)
        glob = fk_rotations(
            bm, rot_ops.rotvec2mat(jnp.asarray(pose).reshape(B, -1, 3))
        )
        ref = bf.fit_shape(
            bm, plan, glob, jnp.asarray(tv), jnp.asarray(tj),
            jnp.asarray(vw), jnp.asarray(jw),
            beta_regularizer=0.5, beta_regularizer2=0.0, scale_regularizer=0.0,
            kid_regularizer=None, share_beta=False, scale_target=False,
            scale_fit=False, requested_keys=('shape_betas',), gram=gram,
        )
        glob9 = jnp.transpose(glob.reshape(B, bm.num_joints, 9), (2, 1, 0))
        # lane-major internals take per-vertex inputs in the chunk layout's
        # vertex order (the driver permutes at ingestion)
        vp = gram.vperm
        vw_lm = jnp.asarray(vw).T
        if vp is not None:
            vw_lm = jnp.take(vw_lm, jnp.asarray(np.asarray(vp)), axis=0)
        got = fit_shape_wgram_lm(
            bm, plan, gram, glob9,
            lbs_kernels.to_vertex_major(jnp.asarray(tv), perm=vp),
            jnp.transpose(jnp.asarray(tj), (2, 1, 0)),
            vw_lm, jnp.asarray(jw).T,
            beta_regularizer=0.5, beta_regularizer2=0.0, kid_regularizer=None,
            share_beta=False, beta_regularizer_reference=None,
            kid_regularizer_reference=None, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got['shape_betas']), np.asarray(ref['shape_betas']),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got['trans']), np.asarray(ref['trans']), atol=5e-4
        )

    def test_weighted_kid_lm_matches_general(self, smpl_model):
        """Per-call weights + kid column through the weighted-Gramian solve."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        fitter = BodyFitter(smpl_model, enable_kid=True)
        pose, betas, trans = random_params(8, seed=63, pose_std=0.12)
        rng = np.random.RandomState(63)
        kid = rng.rand(8).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, kid_factor=kid)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        vw = (0.2 + rng.rand(8, smpl_model.num_vertices)).astype(np.float32)
        jw = (0.2 + rng.rand(8, smpl_model.num_joints)).astype(np.float32)
        kw = dict(
            target_joints=tj, vertex_weights=vw, joint_weights=jw,
            num_iter=2, beta_regularizer=0.1, kid_regularizer=0.0,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
        ref = fitter.fit(tv, **kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = fitter.fit(tv, **kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        for k in ('shape_betas', 'trans', 'pose_rotvecs', 'kid_factor'):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=2e-3, err_msg=k
            )


class TestWarmStartKernelPath:
    """initial_pose_rotvecs / initial_shape_betas (the flipper configuration)
    on the lane-major kernel path vs the batch-major general formulation."""

    @pytest.mark.parametrize('case', ['pose_and_betas', 'betas_only', 'pose_only'])
    def test_warm_start_lm_matches_general(self, smpl_model, smpl_fitter, case):
        from smplfitter_tpu.ops import lbs_kernels

        pose, betas, trans = random_params(8, seed=64, pose_std=0.12)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        rng = np.random.RandomState(64)
        init_pose = pose + rng.randn(*pose.shape).astype(np.float32) * 0.05
        kw = dict(
            target_joints=tj, num_iter=2, final_adjust_rots=True,
            beta_regularizer=0.5, beta_regularizer2=0.1,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
        if case in ('pose_and_betas', 'pose_only'):
            kw['initial_pose_rotvecs'] = init_pose
        if case in ('pose_and_betas', 'betas_only'):
            kw['initial_shape_betas'] = betas
        ref = smpl_fitter.fit(tv, **kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = smpl_fitter.fit(tv, **kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        for k in ('shape_betas', 'trans', 'pose_rotvecs'):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=2e-3, err_msg=k
            )

    def test_warm_start_kid_lm(self, smpl_model):
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        fitter = BodyFitter(smpl_model, enable_kid=True)
        pose, betas, trans = random_params(8, seed=65, pose_std=0.12)
        rng = np.random.RandomState(65)
        kid = rng.rand(8).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, kid_factor=kid)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        kw = dict(
            target_joints=tj, num_iter=2, beta_regularizer=0.1,
            kid_regularizer=0.2, initial_pose_rotvecs=pose,
            initial_shape_betas=betas, initial_kid_factor=kid,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
        ref = fitter.fit(tv, **kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = fitter.fit(tv, **kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        for k in ('shape_betas', 'trans', 'pose_rotvecs', 'kid_factor'):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=2e-3, err_msg=k
            )


class TestScaleKernelPath:
    """Scale columns on the fused-kernel solve (rhs_moments scale moments)
    vs the XLA moment formulation."""

    @pytest.mark.parametrize('mode', ['scale_target', 'scale_fit'])
    @pytest.mark.parametrize('has_joints', [True, False])
    def test_scale_kernel_matches_xla(self, smpl_model, smpl_fitter, mode,
                                      has_joints):
        from smplfitter_tpu.ops import lbs_kernels

        pose, betas, trans = random_params(8, seed=66, pose_std=0.12)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        tv = np.asarray(res['vertices']) * 1.1
        tj = np.asarray(res['joints']) * 1.1
        kw = dict(
            target_vertices=tv,
            target_joints=tj if has_joints else None,
            num_iter=3, beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas', 'scale_corr'],
            **{mode: True},
        )
        ref = smpl_fitter.fit(**kw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = smpl_fitter.fit(**kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        for k in ('shape_betas', 'trans', 'scale_corr', 'pose_rotvecs'):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=3e-3, err_msg=k
            )

    def test_known_pose_per_call_weights_lm(self, smpl_model, smpl_fitter):
        """Per-call weighted known-pose solve (weighted-Gramian kernel) vs
        the batch-major weighted solve."""
        from smplfitter_tpu.ops import lbs_kernels

        pose, betas, trans = random_params(8, seed=67, pose_std=0.12)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        rng = np.random.RandomState(67)
        vw = (0.2 + rng.rand(8, smpl_model.num_vertices)).astype(np.float32)
        jw = (0.2 + rng.rand(8, smpl_model.num_joints)).astype(np.float32)
        for has_joints in (True, False):
            kw = dict(
                pose_rotvecs=pose, target_vertices=tv,
                target_joints=tj if has_joints else None,
                vertex_weights=vw,
                joint_weights=jw if has_joints else None,
                beta_regularizer=0.5,
            )
            ref = smpl_fitter.fit_with_known_pose(**kw)
            lbs_kernels.FORCE_INTERPRET = True
            try:
                got = smpl_fitter.fit_with_known_pose(**kw)
            finally:
                lbs_kernels.FORCE_INTERPRET = False
            for k in ('shape_betas', 'trans'):
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(ref[k]), atol=1e-3,
                    err_msg=f'{k} joints={has_joints}',
                )

    @pytest.mark.parametrize('mode', ['scale_target', 'scale_fit'])
    def test_known_pose_scale_lm(self, smpl_model, smpl_fitter, mode):
        """Known-pose solve with a scale column on the kernel path (both the
        moment-assembled and the runtime-ω weighted-Gramian variants) vs the
        batch-major XLA solve."""
        from smplfitter_tpu.ops import lbs_kernels

        pose, betas, trans = random_params(8, seed=69, pose_std=0.12)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        f = 1.1 if mode == 'scale_target' else 0.9
        tv = np.asarray(res['vertices']) * f
        tj = np.asarray(res['joints']) * f
        rng = np.random.RandomState(69)
        vw = (0.2 + rng.rand(8, smpl_model.num_vertices)).astype(np.float32)
        jw = (0.2 + rng.rand(8, smpl_model.num_joints)).astype(np.float32)
        for weighted in (False, True):
            kw = dict(
                pose_rotvecs=pose, target_vertices=tv, target_joints=tj,
                vertex_weights=vw if weighted else None,
                joint_weights=jw if weighted else None,
                beta_regularizer=0.5, scale_regularizer=0.1,
                **{mode: True},
            )
            ref = smpl_fitter.fit_with_known_pose(use_kernels=False, **kw)
            lbs_kernels.FORCE_INTERPRET = True
            try:
                got = smpl_fitter.fit_with_known_pose(**kw)
            finally:
                lbs_kernels.FORCE_INTERPRET = False
            for k in ('shape_betas', 'trans', 'scale_corr'):
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(ref[k]), atol=1e-3,
                    err_msg=f'{k} weighted={weighted}',
                )

    def test_known_shape_per_call_weights_lm(self, smpl_model, smpl_fitter):
        """Per-call weighted known-shape solve (runtime-ω rotation fits and
        weighted translation) vs the batch-major weighted solve."""
        from smplfitter_tpu.ops import lbs_kernels

        pose, betas, trans = random_params(8, seed=68, pose_std=0.12)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        rng = np.random.RandomState(68)
        vw = (0.2 + rng.rand(8, smpl_model.num_vertices)).astype(np.float32)
        jw = (0.2 + rng.rand(8, smpl_model.num_joints)).astype(np.float32)
        for has_joints in (True, False):
            kw = dict(
                shape_betas=betas, target_vertices=tv,
                target_joints=tj if has_joints else None,
                vertex_weights=vw,
                joint_weights=jw if has_joints else None,
                num_iter=2, requested_keys=['pose_rotvecs'],
            )
            ref = smpl_fitter.fit_with_known_shape(**kw)
            lbs_kernels.FORCE_INTERPRET = True
            try:
                got = smpl_fitter.fit_with_known_shape(**kw)
            finally:
                lbs_kernels.FORCE_INTERPRET = False
            for k in ('trans', 'pose_rotvecs'):
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(ref[k]), atol=2e-3,
                    err_msg=f'{k} joints={has_joints}',
                )


class TestSharedPullSemantics:
    def test_warm_share_matches_np_reference(self, smpl_model, smpl_fitter,
                                             reference_np):
        """share_beta + a regularizer reference (warm start): the shared pull
        enters as l2^2*ref (identity-row semantics, np/lstsq.py:26-55 there).
        NOTE the reference's pt backend DROPS the pull in its n_indep==0
        shortcut (pt/lstsq.py:44-46) — a reference-internal discrepancy; we
        follow the np semantic reference, on both solve formulations."""
        from smplfitter_tpu.ops import lbs_kernels

        pose, betas0, _ = random_params(8, seed=69, pose_std=0.1)
        betas = np.broadcast_to(betas0[:1], betas0.shape).copy()
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        rng = np.random.RandomState(69)
        ref_betas = (betas + rng.randn(*betas.shape).astype(np.float32) * 0.3)
        rfitter = reference_np.BodyFitter(
            reference_np.BodyModel('smpl', 'neutral')
        )
        # The reference np warm-start path forgets to set this attribute.
        rfitter.vertex_subset = np.arange(smpl_model.num_vertices)
        oracle = rfitter.fit(
            tv, tj, initial_shape_betas=ref_betas, num_iter=2,
            beta_regularizer=2.0, share_beta=True,
            requested_keys=['shape_betas'],
        )['shape_betas']
        kw = dict(num_iter=2, beta_regularizer=2.0, share_beta=True,
                  initial_shape_betas=ref_betas,
                  requested_keys=('shape_betas',))
        got_xla = smpl_fitter.fit(tv, tj, use_kernels=False, **kw)
        np.testing.assert_allclose(
            np.asarray(got_xla['shape_betas']), oracle, atol=1e-4
        )
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got_lm = smpl_fitter.fit(tv, tj, **kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(got_lm['shape_betas']), oracle, atol=1e-4
        )


class TestFitScaleAndTranslation:
    """Direct oracle parity of the public scale/translation-only fit
    (reference module function np/bodyfitter.py:1055-1098)."""

    @pytest.mark.parametrize('scale', [False, True])
    @pytest.mark.parametrize('weighted', [False, True])
    def test_matches_np_reference(self, smpl_model, smpl_fitter, reference_np,
                                  scale, weighted):
        import smplfitter.np.bodyfitter as ref_bf

        pose, betas, trans = random_params(3, seed=71, pose_std=0.2)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        ref = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        tv = np.asarray(res['vertices']) * (1.07 if scale else 1.0)
        tj = np.asarray(res['joints']) * (1.07 if scale else 1.0)
        rv, rj = np.asarray(ref['vertices']), np.asarray(ref['joints'])
        rng = np.random.default_rng(71)
        vw = (0.2 + rng.random(tv.shape[:2])).astype(np.float32) if weighted else None
        jw = (0.2 + rng.random(tj.shape[:2])).astype(np.float32) if weighted else None

        got = smpl_fitter.fit_scale_and_translation(
            tv, rv, tj, rj, vertex_weights=vw, joint_weights=jw, scale=scale
        )
        want_scale, want_trans = ref_bf.fit_scale_and_translation(
            tv, rv, tj, rj, vertex_weights=vw, joint_weights=jw, scale=scale
        )
        np.testing.assert_allclose(
            np.asarray(got['trans']), want_trans, atol=2e-5
        )
        if scale:
            np.testing.assert_allclose(
                np.asarray(got['scale_corr']), want_scale, atol=2e-5
            )
        else:
            assert 'scale_corr' not in got

    def test_vertices_only_weighted(self, smpl_model, smpl_fitter, reference_np):
        import smplfitter.np.bodyfitter as ref_bf

        pose, betas, trans = random_params(2, seed=72, pose_std=0.2)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        ref = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        tv, rv = np.asarray(res['vertices']), np.asarray(ref['vertices'])
        rng = np.random.default_rng(72)
        vw = (0.2 + rng.random(tv.shape[:2])).astype(np.float32)
        got = smpl_fitter.fit_scale_and_translation(
            tv, rv, vertex_weights=vw, scale=True
        )
        want_scale, want_trans = ref_bf.fit_scale_and_translation(
            tv, rv, None, None, vertex_weights=vw, scale=True
        )
        np.testing.assert_allclose(np.asarray(got['trans']), want_trans, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got['scale_corr']), want_scale, atol=2e-5
        )
