"""Equivalence of the chunked streaming weighted shape solve vs the dense
design-matrix formulation (and vs the moment-tensor gram path when unweighted).

The streaming path solves the translation-augmented normal equations chunk by
chunk; algebraically identical to the dense path's weighted-mean centering, so
results must agree to f32 reduction-order noise.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import random_params


@pytest.fixture(scope='module')
def setup(smpl_model):
    import jax.numpy as jnp

    from smplfitter_tpu import BodyFitter
    from smplfitter_tpu.models.bodymodel import fk_rotations
    from smplfitter_tpu.ops import rotation as rot_ops

    fitter = BodyFitter(smpl_model, enable_kid=True)
    rng = np.random.default_rng(21)
    B = 6
    pose, betas, trans = random_params(B, seed=21, pose_std=0.25)
    res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
    bm = smpl_model.data
    rel = rot_ops.rotvec2mat(jnp.asarray(pose).reshape(B, bm.num_joints, 3))
    glob = fk_rotations(bm, rel)
    vw = rng.uniform(0.2, 2.0, (B, smpl_model.num_vertices)).astype(np.float32)
    jw = rng.uniform(0.2, 2.0, (B, smpl_model.num_joints)).astype(np.float32)
    return dict(
        fitter=fitter, bm=bm, glob=glob,
        tv=np.asarray(res['vertices']), tj=np.asarray(res['joints']),
        vw=vw, jw=jw, rng=rng,
    )


def _solve(s, streamed, **kw):
    from smplfitter_tpu.models.bodyfitter import fit_shape
    from smplfitter_tpu.ops.precision import matmul_precision

    base = dict(
        target_joints=None, vertex_weights=None, joint_weights=None,
        beta_regularizer=0.5, requested_keys=('vertices', 'joints'),
        gram=s['fitter'].gram,
    )
    base.update(kw)
    with matmul_precision():
        return fit_shape(
            s['bm'], s['fitter'].plan, s['glob'], s['tv'],
            streamed=streamed, **base,
        )


def _assert_same(a, b, atol=2e-4):
    for k in ('shape_betas', 'trans', 'kid_factor', 'scale_corr', 'vertices', 'joints'):
        if a.get(k) is None or b.get(k) is None:
            assert a.get(k) is None and b.get(k) is None, k
            continue
        x, y = np.asarray(a[k]), np.asarray(b[k])
        scale = max(1.0, np.abs(y).max())
        np.testing.assert_allclose(x / scale, y / scale, atol=atol, err_msg=k)


class TestStreamedShapeSolve:
    def test_weighted_vertices_only(self, setup):
        kw = dict(vertex_weights=setup['vw'])
        _assert_same(_solve(setup, True, **kw), _solve(setup, False, **kw))

    def test_weighted_with_joints(self, setup):
        kw = dict(
            target_joints=setup['tj'], vertex_weights=setup['vw'],
            joint_weights=setup['jw'],
        )
        _assert_same(_solve(setup, True, **kw), _solve(setup, False, **kw))

    def test_weighted_share_beta(self, setup):
        kw = dict(
            target_joints=setup['tj'], vertex_weights=setup['vw'],
            joint_weights=setup['jw'], share_beta=True,
        )
        a, b = _solve(setup, True, **kw), _solve(setup, False, **kw)
        _assert_same(a, b)
        assert np.std(np.asarray(a['shape_betas']), axis=0).max() < 1e-5

    def test_weighted_scale_target(self, setup):
        kw = dict(
            target_joints=setup['tj'], vertex_weights=setup['vw'],
            joint_weights=setup['jw'], scale_target=True,
        )
        _assert_same(_solve(setup, True, **kw), _solve(setup, False, **kw))

    def test_weighted_scale_fit(self, setup):
        kw = dict(
            target_joints=setup['tj'], vertex_weights=setup['vw'],
            joint_weights=setup['jw'], scale_fit=True,
            scale_regularizer=0.5,
        )
        _assert_same(_solve(setup, True, **kw), _solve(setup, False, **kw))

    def test_weighted_beta_reference_pull(self, setup):
        ref = setup['rng'].normal(0, 1, (6, 10)).astype(np.float32)
        kw = dict(
            vertex_weights=setup['vw'], beta_regularizer=2.0,
            beta_regularizer_reference=np.asarray(ref),
        )
        import jax.numpy as jnp

        kw['beta_regularizer_reference'] = jnp.asarray(ref)
        _assert_same(_solve(setup, True, **kw), _solve(setup, False, **kw))

    def test_unweighted_streamed_matches_gram(self, setup):
        """streamed=True with synthesized unit weights == the gram fast path."""
        kw = dict(target_joints=setup['tj'])
        _assert_same(_solve(setup, True, **kw), _solve(setup, False, **kw))

    def test_vertex_weights_without_joint_weights_ignored(self, setup):
        """Reference rule: with joints present, vertex weights alone are
        IGNORED — result equals the unweighted solve (and routes to gram)."""
        a = _solve(setup, None, target_joints=setup['tj'],
                   vertex_weights=setup['vw'])
        b = _solve(setup, None, target_joints=setup['tj'])
        _assert_same(a, b, atol=1e-6)

    def test_weighted_fit_end_to_end_oracle(self, setup, reference_np,
                                            body_models_dir):
        """Full weighted fit (now streaming) vs the reference NumPy backend."""
        fitter = setup['fitter']
        ref_bm = reference_np.BodyModel('smpl', 'neutral')
        ref_fitter = reference_np.BodyFitter(ref_bm, enable_kid=True)
        kw = dict(
            num_iter=2, beta_regularizer=0.5, final_adjust_rots=True,
            requested_keys=['pose_rotvecs', 'shape_betas', 'trans'],
        )
        ours = fitter.fit(
            setup['tv'], setup['tj'], vertex_weights=setup['vw'],
            joint_weights=setup['jw'], **kw,
        )
        ref = ref_fitter.fit(
            target_vertices=setup['tv'], target_joints=setup['tj'],
            vertex_weights=setup['vw'], joint_weights=setup['jw'], **kw,
        )
        for k in ('shape_betas', 'trans'):
            np.testing.assert_allclose(
                np.asarray(ours[k]), ref[k], atol=2e-3, err_msg=k
            )
