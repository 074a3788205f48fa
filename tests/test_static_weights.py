"""Static (construction-time) fit weights: semantics and weighted kernels.

A ``BodyFitter(model, vertex_weights=..., joint_weights=...)`` bakes fixed fit
weights into the precomputed part/moment statistics so the fused-kernel fast
path stays eligible (per-call per-vertex weights force the streamed general
solve — cf. the reference's runtime-weighted fits,
/root/reference/src/smplfitter/np/bodyfitter.py:160-184). The contract: a
statically-weighted fit equals the same fit with those weights passed
per-call (broadcast over the batch).
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import random_params


def _targets(model, batch=8, seed=50):
    pose, betas, trans = random_params(batch, seed=seed, pose_std=0.15)
    res = model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
    return np.asarray(res['vertices']), np.asarray(res['joints'])


def _static_weights(model, seed=51):
    rng = np.random.default_rng(seed)
    vw = rng.uniform(0.1, 2.0, model.num_vertices).astype(np.float32)
    jw = rng.uniform(0.2, 2.0, model.num_joints).astype(np.float32)
    return vw, jw


FIT_KW = dict(num_iter=3, beta_regularizer=0.5,
              requested_keys=['pose_rotvecs', 'shape_betas', 'trans'])


def _assert_fits_match(got, ref, tol):
    for k in ('shape_betas', 'trans', 'pose_rotvecs'):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), atol=tol, err_msg=k
        )


class TestStaticWeightSemantics:
    """Static weights == the same weights per-call (batch-major XLA path)."""

    def _fitters(self, smpl_model):
        from smplfitter_tpu import BodyFitter

        vw, jw = _static_weights(smpl_model)
        return (
            BodyFitter(smpl_model),
            BodyFitter(smpl_model, vertex_weights=vw),
            BodyFitter(smpl_model, vertex_weights=vw, joint_weights=jw),
            vw, jw,
        )

    def test_vertex_weights_no_joints(self, smpl_model):
        plain, f_vw, _, vw, _ = self._fitters(smpl_model)
        tv, _ = _targets(smpl_model)
        B, V = tv.shape[:2]
        ref = plain.fit(tv, vertex_weights=np.broadcast_to(vw, (B, V)).copy(),
                        **FIT_KW)
        got = f_vw.fit(tv, **FIT_KW)
        _assert_fits_match(got, ref, 1e-6)

    def test_vertex_weights_with_joints(self, smpl_model):
        plain, f_vw, _, vw, _ = self._fitters(smpl_model)
        tv, tj = _targets(smpl_model)
        B, V = tv.shape[:2]
        ref = plain.fit(tv, tj, vertex_weights=np.broadcast_to(vw, (B, V)).copy(),
                        **FIT_KW)
        got = f_vw.fit(tv, tj, **FIT_KW)
        _assert_fits_match(got, ref, 1e-6)

    def test_both_weights_with_joints(self, smpl_model):
        plain, _, f_both, vw, jw = self._fitters(smpl_model)
        tv, tj = _targets(smpl_model)
        B, V = tv.shape[:2]
        J = smpl_model.num_joints
        ref = plain.fit(tv, tj,
                        vertex_weights=np.broadcast_to(vw, (B, V)).copy(),
                        joint_weights=np.broadcast_to(jw, (B, J)).copy(),
                        **FIT_KW)
        got = f_both.fit(tv, tj, **FIT_KW)
        _assert_fits_match(got, ref, 1e-6)

    def test_per_call_weights_rejected(self, smpl_model):
        _, f_vw, _, _, _ = self._fitters(smpl_model)
        tv, _ = _targets(smpl_model)
        with pytest.raises(ValueError, match='static'):
            f_vw.fit(tv, vertex_weights=np.ones(tv.shape[:2], np.float32),
                     **FIT_KW)

    def test_bad_shapes_rejected(self, smpl_model):
        from smplfitter_tpu import BodyFitter

        with pytest.raises(ValueError, match='vertex_weights'):
            BodyFitter(smpl_model, vertex_weights=np.ones(3, np.float32))
        with pytest.raises(ValueError, match='joint_weights'):
            BodyFitter(smpl_model, joint_weights=np.ones(3, np.float32))

    def test_known_pose_and_shape(self, smpl_model):
        from smplfitter_tpu import BodyFitter

        plain, _, f_both, vw, jw = self._fitters(smpl_model)
        pose, betas, trans = random_params(8, seed=52, pose_std=0.15)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        B, V = tv.shape[:2]
        J = smpl_model.num_joints
        vwb = np.broadcast_to(vw, (B, V)).copy()
        jwb = np.broadcast_to(jw, (B, J)).copy()

        kp = f_both.fit_with_known_pose(pose, tv, tj, requested_keys=['shape_betas'])
        kp_ref = plain.fit_with_known_pose(
            pose, tv, tj, vertex_weights=vwb, joint_weights=jwb,
            requested_keys=['shape_betas'])
        np.testing.assert_allclose(
            np.asarray(kp['shape_betas']), np.asarray(kp_ref['shape_betas']),
            atol=1e-6)

        ks = f_both.fit_with_known_shape(betas, tv, tj,
                                         requested_keys=['pose_rotvecs'])
        ks_ref = plain.fit_with_known_shape(
            betas, tv, tj, vertex_weights=vwb, joint_weights=jwb,
            requested_keys=['pose_rotvecs'])
        np.testing.assert_allclose(
            np.asarray(ks['pose_rotvecs']), np.asarray(ks_ref['pose_rotvecs']),
            atol=1e-6)


class TestStaticWeightKernelPath:
    """Forced-interpret kernels: the lane-major ω-weighted fit vs the
    batch-major per-call weighted fit (different reduction orders; small
    f32 tolerance)."""

    @pytest.mark.parametrize('with_joints', [False, True])
    def test_vertex_weights(self, smpl_model, with_joints):
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        vw, jw = _static_weights(smpl_model)
        tv, tj = _targets(smpl_model)
        B, V = tv.shape[:2]
        J = smpl_model.num_joints
        plain = BodyFitter(smpl_model)
        ref = plain.fit(
            tv, tj if with_joints else None,
            vertex_weights=np.broadcast_to(vw, (B, V)).copy(),
            joint_weights=np.broadcast_to(jw, (B, J)).copy() if with_joints else None,
            **FIT_KW,
        )
        f = BodyFitter(smpl_model, vertex_weights=vw,
                       joint_weights=jw if with_joints else None)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = f.fit(tv, tj if with_joints else None, **FIT_KW)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        _assert_fits_match(got, ref, 5e-4)

    def test_known_pose_static_weights_lm(self, smpl_model):
        """Static-weight fitter on the lane-major known-pose solve vs the
        per-call batch-major weighted solve."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        vw, jw = _static_weights(smpl_model)
        pose, betas, trans = random_params(8, seed=57, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        B, V = tv.shape[:2]
        J = smpl_model.num_joints
        ref = BodyFitter(smpl_model).fit_with_known_pose(
            pose, tv, tj,
            vertex_weights=np.broadcast_to(vw, (B, V)).copy(),
            joint_weights=np.broadcast_to(jw, (B, J)).copy(),
            beta_regularizer=0.5, requested_keys=['shape_betas'])
        f = BodyFitter(smpl_model, vertex_weights=vw, joint_weights=jw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = f.fit_with_known_pose(pose, tv, tj, beta_regularizer=0.5,
                                        requested_keys=['shape_betas'])
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(got['shape_betas']), np.asarray(ref['shape_betas']),
            atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(got['trans']), np.asarray(ref['trans']), atol=5e-4)

    def test_known_shape_static_weights_lm(self, smpl_model):
        """Static-weight fitter on the lane-major known-shape solve vs the
        per-call batch-major weighted solve (weighted rotations AND the
        both-weights weighted translation)."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        vw, jw = _static_weights(smpl_model)
        pose, betas, trans = random_params(8, seed=60, pose_std=0.1)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        B, V = tv.shape[:2]
        J = smpl_model.num_joints
        ref = BodyFitter(smpl_model).fit_with_known_shape(
            betas, tv, tj,
            vertex_weights=np.broadcast_to(vw, (B, V)).copy(),
            joint_weights=np.broadcast_to(jw, (B, J)).copy(),
            num_iter=2, requested_keys=['pose_rotvecs'])
        f = BodyFitter(smpl_model, vertex_weights=vw, joint_weights=jw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = f.fit_with_known_shape(betas, tv, tj, num_iter=2,
                                         requested_keys=['pose_rotvecs'])
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(got['trans']), np.asarray(ref['trans']), atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(got['pose_rotvecs']), np.asarray(ref['pose_rotvecs']),
            atol=2e-3)

    def test_smplh_static_vw_kernel_path(self, body_models_dir):
        """HandReplacer's model family (smplh16, J=52, no target joints):
        static-ω lane-major fit vs the per-call batch-major solve."""
        from smplfitter_tpu import BodyFitter, BodyModel
        from smplfitter_tpu.ops import lbs_kernels

        bm = BodyModel('smplh16', 'neutral')
        pose, betas, trans = random_params(
            8, num_joints=bm.num_joints, num_betas=16, seed=54, pose_std=0.1
        )
        res = bm(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        tv = np.asarray(res['vertices'])
        B, V = tv.shape[:2]
        vw = np.ones(V, np.float32)
        vw[: V // 8] = 0.1
        # beta_regularizer > 0: the synthetic smplh16 shape basis is nearly
        # degenerate, and unregularized betas blow up to O(15) where f32
        # solver-order noise exceeds any absolute tolerance.
        kw = dict(num_iter=3, beta_regularizer=0.5, final_adjust_rots=False,
                  requested_keys=['pose_rotvecs', 'shape_betas', 'trans'])
        ref = BodyFitter(bm).fit(
            tv, vertex_weights=np.broadcast_to(vw, (B, V)).copy(), **kw)
        f = BodyFitter(bm, vertex_weights=vw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = f.fit(tv, **kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        # Tolerance calibrated against the f64 reference oracle on this same
        # configuration: each path lands within ~2e-2 of the oracle's poses
        # (the synthetic smplh shape basis is near-degenerate, so f32
        # reduction order moves the iterated fit this much), so two f32 paths
        # may legitimately differ by ~4e-2 from each other (the chunk-layout
        # vertex reordering shifts the kernel path's summation order, worth
        # ~1e-2 here on top of the pre-existing ~3e-2).
        _assert_fits_match(got, ref, 4e-2)

    def test_oracle_parity_no_joints(self, smpl_model, reference_np):
        """HandReplacer configuration (vertex-only weights, no joints): the
        ω-weighted kernel fit against the reference oracle's per-call
        weighted fit."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        vw, _ = _static_weights(smpl_model)
        tv, _ = _targets(smpl_model, seed=53)
        B, V = tv.shape[:2]
        ref_fitter = reference_np.BodyFitter(
            reference_np.BodyModel('smpl', 'neutral'))
        ref = ref_fitter.fit(
            target_vertices=tv,
            vertex_weights=np.broadcast_to(vw, (B, V)).copy(), **FIT_KW)
        f = BodyFitter(smpl_model, vertex_weights=vw)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            got = f.fit(tv, **FIT_KW)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(got['shape_betas']), ref['shape_betas'], atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(got['trans']), ref['trans'], atol=5e-3)
        # The weighted final adjustment amplifies f32-vs-f64 solver noise
        # into pose_rotvecs (the reference documents the same effect for mere
        # reduction-order changes, pt/bodyfitter.py:250-255); our per-call
        # weighted path shows the identical ~2e-2 deviation on these targets.
        np.testing.assert_allclose(
            np.asarray(got['pose_rotvecs']), ref['pose_rotvecs'], atol=2.5e-2)


class TestWeightedKernels:
    """ω-weighted kernel forward/VJP vs the plain kernels on pre-scaled
    operands (exact relationships)."""

    def _setup(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(7)
        B, V, J, F, E = 16, 256, 12, 15, 9
        feat = rng.normal(size=(F, B)).astype(np.float32)
        feat[-1] = 1.0
        consts = rng.normal(size=(4, V, F)).astype(np.float32)
        consts[3] = 0.0
        consts[3, :, -1] = 1.0
        omega = rng.uniform(0.1, 2.0, size=(V, 1)).astype(np.float32)
        return dict(
            tgt=jnp.asarray(rng.normal(size=(3, V, B)).astype(np.float32)),
            pj=jnp.asarray(rng.normal(size=(12, J, B)).astype(np.float32)),
            feat=jnp.asarray(feat),
            wts=jnp.asarray(rng.uniform(0, 1, size=(V, J)).astype(np.float32)),
            consts=jnp.asarray(consts),
            sd_cm=jnp.asarray(rng.normal(size=(3, V, E)).astype(np.float32)),
            omega=jnp.asarray(omega),
            pm=jnp.asarray(
                np.eye(J, dtype=np.float32)[:, rng.integers(0, J, V)]
            ),
            shape=(B, V, J, F, E),
        )

    def test_part_sums_weighted(self):
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()
        B, V, J, F, E = d['shape']
        a = jnp.asarray(
            np.random.default_rng(8).normal(size=(3, V, B)).astype(np.float32)
        )
        raw_w, st_w, sa_w = K.part_sums_vm_lm(
            d['tgt'], a, d['pm'], omega=d['omega'], interpret=True
        )
        om = np.asarray(d['omega'])[:, 0]
        raw_ref = np.einsum('jv,v,cvb,dvb->cdjb', d['pm'], om, d['tgt'], a
                            ).reshape(9, J, B)
        st_ref = np.einsum('jv,v,cvb->cjb', d['pm'], om, d['tgt'])
        sa_ref = np.einsum('jv,v,cvb->cjb', d['pm'], om, a)
        np.testing.assert_allclose(np.asarray(raw_w), raw_ref, atol=2e-3)
        np.testing.assert_allclose(np.asarray(st_w), st_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sa_w), sa_ref, atol=1e-4)

    def test_part_sums_weighted_vjp(self):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()
        B, V, J, F, E = d['shape']
        a = jnp.asarray(
            np.random.default_rng(9).normal(size=(3, V, B)).astype(np.float32)
        )

        def loss_w(t, a):
            raw, st, sa = K.part_sums_vm_lm(t, a, d['pm'], omega=d['omega'],
                                            interpret=True)
            return jnp.sum(jnp.sin(raw)) + jnp.sum(st**2) + jnp.sum(jnp.cos(sa))

        om = np.asarray(d['omega'])[:, 0]

        def loss_x(t, a):
            raw = jnp.einsum('jv,v,cvb,dvb->cdjb', d['pm'], om, t, a
                             ).reshape(9, J, B)
            st = jnp.einsum('jv,v,cvb->cjb', d['pm'], om, t)
            sa = jnp.einsum('jv,v,cvb->cjb', d['pm'], om, a)
            return jnp.sum(jnp.sin(raw)) + jnp.sum(st**2) + jnp.sum(jnp.cos(sa))

        gk = jax.grad(loss_w, argnums=(0, 1))(d['tgt'], a)
        gx = jax.grad(loss_x, argnums=(0, 1))(d['tgt'], a)
        for g1, g2 in zip(gk, gx):
            scale = max(1.0, float(np.abs(np.asarray(g2)).max()))
            np.testing.assert_allclose(
                np.asarray(g1) / scale, np.asarray(g2) / scale, atol=5e-4
            )

    @staticmethod
    def _xla_pos(d, pj, feat):
        import jax.numpy as jnp

        B, V, J, F, E = d['shape']
        homog = jnp.einsum('cvf,fb->cvb', d['consts'], feat)
        blended = jnp.einsum('vj,xjb->xvb', d['wts'], pj).reshape(3, 4, V, B)
        return jnp.einsum('acvb,cvb->avb', blended, homog), blended

    def test_rhs_moments_weighted(self):
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()
        r_w, y_w = K.rhs_moments(d['tgt'], d['pj'], d['feat'], d['wts'],
                                 d['consts'], d['sd_cm'], omega=d['omega'],
                                 interpret=True)
        pos, blended = self._xla_pos(d, d['pj'], d['feat'])
        b = (d['tgt'] - pos) * d['omega'][None, :, 0:1]  # ω-weighted residual
        g = jnp.einsum('acvb,avb->cvb', blended[:, :3], b)
        r_ref = jnp.einsum('cve,cvb->eb', d['sd_cm'], g)
        y_ref = jnp.einsum('avb,vj->ajb', b, d['wts'])
        scale_r = float(np.max(np.abs(np.asarray(r_ref))))
        np.testing.assert_allclose(np.asarray(r_w), np.asarray(r_ref),
                                   rtol=2e-4, atol=5e-5 * scale_r)
        scale_y = float(np.max(np.abs(np.asarray(y_ref))))
        np.testing.assert_allclose(np.asarray(y_w), np.asarray(y_ref),
                                   rtol=2e-4, atol=5e-5 * scale_y)

    def test_rhs_moments_weighted_vjp(self):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()

        def loss_k(tgt, pj, feat):
            r, y = K.rhs_moments(tgt, pj, feat, d['wts'], d['consts'],
                                 d['sd_cm'], omega=d['omega'], interpret=True)
            return jnp.sum(jnp.sin(r * 1e-3)) + jnp.sum(jnp.cos(y * 1e-2))

        def loss_x(tgt, pj, feat):
            pos, blended = self._xla_pos(d, pj, feat)
            b = (tgt - pos) * d['omega'][None, :, 0:1]
            g = jnp.einsum('acvb,avb->cvb', blended[:, :3], b)
            r = jnp.einsum('cve,cvb->eb', d['sd_cm'], g)
            y = jnp.einsum('avb,vj->ajb', b, d['wts'])
            return jnp.sum(jnp.sin(r * 1e-3)) + jnp.sum(jnp.cos(y * 1e-2))

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        for g1, g2 in zip(gk, gx):
            scale = max(1.0, float(np.abs(np.asarray(g2)).max()))
            np.testing.assert_allclose(
                np.asarray(g1) / scale, np.asarray(g2) / scale, atol=5e-4
            )

    def test_recon_part_sums_weighted(self):
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()
        B, V, J, F, E = d['shape']
        raw_w, st_w, sa_w = K.recon_part_sums_lm(
            d['tgt'], d['pj'], d['feat'], d['wts'], d['consts'], d['pm'],
            omega=d['omega'], interpret=True,
        )
        pos, _ = self._xla_pos(d, d['pj'], d['feat'])
        om = np.asarray(d['omega'])[:, 0]
        raw_ref = np.einsum('jv,v,cvb,dvb->cdjb', d['pm'], om, d['tgt'],
                            np.asarray(pos)).reshape(9, J, B)
        st_ref = np.einsum('jv,v,cvb->cjb', d['pm'], om, d['tgt'])
        sa_ref = np.einsum('jv,v,cvb->cjb', d['pm'], om, np.asarray(pos))
        scale = np.max(np.abs(raw_ref))
        np.testing.assert_allclose(np.asarray(raw_w), raw_ref, atol=3e-4 * scale)
        np.testing.assert_allclose(np.asarray(st_w), st_ref, rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sa_w), sa_ref, rtol=2e-4,
                                   atol=3e-4 * max(1.0, np.max(np.abs(sa_ref))))

    def test_recon_part_sums_weighted_vjp(self):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()
        om_col = d['omega'][:, 0][None, :, None]  # (1, V, 1)

        def loss_k(tgt, pj, feat):
            raw, st, sa = K.recon_part_sums_lm(
                tgt, pj, feat, d['wts'], d['consts'], d['pm'],
                omega=d['omega'], interpret=True,
            )
            return (jnp.sum(jnp.sin(raw * 1e-2)) + jnp.sum(st**2) * 1e-4
                    + jnp.sum(jnp.cos(sa * 1e-2)))

        def loss_x(tgt, pj, feat):
            pos, _ = self._xla_pos(d, pj, feat)
            tw = tgt * om_col
            raw = jnp.einsum('jv,cvb,dvb->cdjb', d['pm'], tw, pos)
            B, V, J, F, E = d['shape']
            raw = raw.reshape(9, J, B)
            st = jnp.einsum('jv,cvb->cjb', d['pm'], tw)
            sa = jnp.einsum('jv,cvb->cjb', d['pm'], pos * om_col)
            return (jnp.sum(jnp.sin(raw * 1e-2)) + jnp.sum(st**2) * 1e-4
                    + jnp.sum(jnp.cos(sa * 1e-2)))

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        for g1, g2 in zip(gk, gx):
            scale = max(1.0, float(np.abs(np.asarray(g2)).max()))
            np.testing.assert_allclose(
                np.asarray(g1) / scale, np.asarray(g2) / scale, atol=6e-4
            )


class TestRuntimeOmegaEdgeMasking:
    def test_weighted_lm_non_divisible_subset(self, body_models_dir):
        """Runtime (V, B) ω with a vertex count that is NOT a multiple of the
        kernel chunk (V=600 → 88-row edge chunk): exercises the in-kernel ω
        edge masking on part_sums/rhs/wgram vs the batch-major solve."""
        import numpy as np

        from smplfitter_tpu import BodyFitter, BodyModel
        from smplfitter_tpu.ops import lbs_kernels

        rng = np.random.RandomState(88)
        full_v = BodyModel('smpl', 'neutral').num_vertices
        n_sub = min(600, full_v - 8)
        assert n_sub % 256 != 0, 'need a non-chunk-divisible vertex count'
        subset = np.sort(rng.choice(full_v, n_sub, replace=False))
        bm = BodyModel('smpl', 'neutral', vertex_subset=subset)
        fitter = BodyFitter(bm)
        B = 8
        pose = rng.randn(B, bm.num_joints * 3).astype(np.float32) * 0.1
        betas = rng.randn(B, 10).astype(np.float32)
        res = bm(pose_rotvecs=pose, shape_betas=betas)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        vw = (0.2 + rng.rand(B, bm.num_vertices)).astype(np.float32)
        jw = (0.2 + rng.rand(B, bm.num_joints)).astype(np.float32)
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
        for k in ('shape_betas', 'trans', 'pose_rotvecs'):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=3e-3, err_msg=k
            )
