"""Pallas kernel tests (interpret mode on CPU)."""

from __future__ import annotations

import numpy as np
import pytest


class TestPartSumsVm:
    def test_matches_einsum(self):
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        rng = np.random.default_rng(0)
        B, V, J = 16, 256, 24
        pm = np.zeros((J, V), np.float32)
        pm[rng.integers(0, J, V), np.arange(V)] = 1.0
        t = rng.normal(size=(B, V, 3)).astype(np.float32)
        t_vm = K.to_vertex_major(jnp.asarray(t), V)
        for Ba in (1, B):
            a = rng.normal(size=(Ba, V, 3)).astype(np.float32)
            a_vm = K.to_vertex_major(jnp.asarray(a), V)
            raw, st, sa = K.part_sums_vm(t_vm, a_vm, jnp.asarray(pm), interpret=True)
            a_full = np.broadcast_to(a, (B, V, 3))
            raw_ref = np.einsum('jv,bvc,bvd->bjcd', pm, t, a_full)
            st_ref = np.einsum('jv,bvc->bjc', pm, t)
            sa_ref = np.einsum('jv,bvc->bjc', pm, a)
            np.testing.assert_allclose(np.asarray(raw), raw_ref, atol=1e-4)
            np.testing.assert_allclose(np.asarray(st), st_ref, atol=1e-5)
            np.testing.assert_allclose(np.asarray(sa), sa_ref, atol=1e-5)


class TestLbsKernels:
    def _setup(self, seed=1):
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        rng = np.random.default_rng(seed)
        B, V, J, F, E = 16, 512, 24, 20, 11
        tgt = rng.normal(size=(B, V, 3)).astype(np.float32)
        pj = rng.normal(size=(3, 4, J, B)).astype(np.float32)  # (a, c4, j, b)
        feat = rng.normal(size=(F, B)).astype(np.float32)
        wts = rng.uniform(0, 1, size=(V, J)).astype(np.float32)
        consts = rng.normal(size=(4, V, F)).astype(np.float32)
        # Kernel contract: the 4th homogeneous channel projects to exactly 1
        # (constant feature entry x unit template channel) — the kernels skip
        # its dot and use the blended translation directly.
        feat[-1] = 1.0
        consts[3] = 0.0
        consts[3, :, -1] = 1.0
        sd = rng.normal(size=(V, 3, E)).astype(np.float32)
        homog = np.einsum('cvf,fb->vcb', consts, feat)  # (V, 4, B)
        blended = np.einsum('vj,acjb->vacb', wts, pj)  # (V, 3, 4, B)
        pos = np.einsum('vacb,vcb->avb', blended, homog)  # (3, V, B)
        return K, jnp, dict(
            B=B, V=V, J=J, tgt=tgt, pj=pj, feat=feat, wts=wts, consts=consts,
            sd=sd, pos=pos, blended=blended,
        )

    def test_rhs_moments(self):
        K, jnp, d = self._setup()
        tgt_vm = K.to_vertex_major(jnp.asarray(d['tgt']), d['V'])
        pj_cm = jnp.asarray(d['pj'].reshape(12, d['J'], d['B']))
        r, y = K.rhs_moments(
            tgt_vm, pj_cm, jnp.asarray(d['feat']), jnp.asarray(d['wts']),
            jnp.asarray(d['consts']), jnp.asarray(d['sd'].transpose(1, 0, 2)),
            interpret=True,
        )
        b = d['tgt'].transpose(2, 1, 0) - d['pos']  # (3, V, B)
        # r_e = Σ_v Σ_c SD_v[c,e] (R̄_vᵀ b_v)_c with R̄[a,c] = blended[v,a,c,b]
        g = np.einsum('vacb,avb->cvb', d['blended'][:, :, :3], b)
        r_ref = np.einsum('vce,cvb->eb', d['sd'], g)
        y_ref = np.einsum('avb,vj->ajb', b, d['wts'])  # kernel returns (3, J, B)
        # The kernel dots run 3-pass bf16 f32-emulation; the error floor is
        # ~2e-5 of the accumulated-magnitude scale.
        scale_r = np.max(np.abs(r_ref))
        np.testing.assert_allclose(np.asarray(r), r_ref, rtol=2e-4, atol=5e-5 * scale_r)
        scale_y = np.max(np.abs(y_ref))
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=5e-5 * scale_y)

    def test_recon_part_sums(self):
        K, jnp, d = self._setup(seed=3)
        rng = np.random.default_rng(4)
        J = d['J']
        V = d['V']
        pm = np.zeros((J, V), np.float32)
        pm[rng.integers(0, J, V), np.arange(V)] = 1.0
        tgt_vm = K.to_vertex_major(jnp.asarray(d['tgt']), V)
        pj_cm = jnp.asarray(d['pj'].reshape(12, J, d['B']))
        raw, st, sa = K.recon_part_sums(
            tgt_vm, pj_cm, jnp.asarray(d['feat']), jnp.asarray(d['wts']),
            jnp.asarray(d['consts']), jnp.asarray(pm), interpret=True,
        )
        t = d['tgt']  # (B, V, 3)
        a = d['pos'].transpose(2, 1, 0)  # (B, V, 3) reconstructed points
        raw_ref = np.einsum('jv,bvc,bvd->bjcd', pm, t, a)
        st_ref = np.einsum('jv,bvc->bjc', pm, t)
        sa_ref = np.einsum('jv,bvc->bjc', pm, a)
        scale = np.max(np.abs(raw_ref))
        np.testing.assert_allclose(np.asarray(raw), raw_ref, atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(st), st_ref, rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sa), sa_ref, rtol=2e-4,
                                   atol=2e-4 * np.max(np.abs(sa_ref)))

    def test_lbs_points(self):
        K, jnp, d = self._setup(seed=2)
        pj_cm = jnp.asarray(d['pj'].reshape(12, d['J'], d['B']))
        pts = K.lbs_points(
            pj_cm, jnp.asarray(d['feat']), jnp.asarray(d['wts']),
            jnp.asarray(d['consts']), interpret=True,
        )
        np.testing.assert_allclose(np.asarray(pts), d['pos'], rtol=2e-4, atol=2e-3)


class TestForcedKernelForward:
    def test_forward_kernel_vs_xla(self, smpl_model):
        """BodyModel forward with the fused LBS kernel (interpret mode on CPU)
        must match the XLA formulation."""
        from smplfitter_tpu.ops import lbs_kernels

        rng = np.random.default_rng(5)
        pose = rng.normal(0, 0.3, (8, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (8, 10)).astype(np.float32)
        trans = rng.normal(0, 0.5, (8, 3)).astype(np.float32)
        plain = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            kernel = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(kernel['vertices']), np.asarray(plain['vertices']), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(kernel['joints']), np.asarray(plain['joints']), atol=1e-6
        )


class TestForcedKernelFit:
    def test_full_fit_with_forced_kernels(self, smpl_model):
        """End-to-end fit with the component-major kernel path forced on CPU
        (interpret mode) — must match the XLA path."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(2)
        pose = rng.normal(0, 0.1, (8, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (8, 10)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        kwargs = dict(num_iter=2, beta_regularizer=0.0,
                      requested_keys=['pose_rotvecs', 'shape_betas', 'trans'])
        plain = fitter.fit(res['vertices'], res['joints'], **kwargs)

        lbs_kernels.FORCE_INTERPRET = True
        try:
            kernel = fitter.fit(res['vertices'], res['joints'], **kwargs)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(kernel['shape_betas']), np.asarray(plain['shape_betas']),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(kernel['trans']), np.asarray(plain['trans']), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(kernel['pose_rotvecs']), np.asarray(plain['pose_rotvecs']),
            atol=5e-3,
        )


class TestKernelVJPs:
    """Backward kernels vs XLA autodiff of the same math (interpret mode)."""

    def _setup(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        B, V, J, F, E = 16, 256, 12, 15, 9
        feat = rng.normal(size=(F, B)).astype(np.float32)
        feat[-1] = 1.0
        consts = rng.normal(size=(4, V, F)).astype(np.float32)
        consts[3] = 0.0
        consts[3, :, -1] = 1.0  # 4th homogeneous channel projects to 1
        d = dict(
            tgt=jnp.asarray(rng.normal(size=(3, V, B)).astype(np.float32)),
            pj=jnp.asarray(rng.normal(size=(12, J, B)).astype(np.float32)),
            feat=jnp.asarray(feat),
            wts=jnp.asarray(rng.uniform(0, 1, size=(V, J)).astype(np.float32)),
            consts=jnp.asarray(consts),
            sd_cm=jnp.asarray(rng.normal(size=(3, V, E)).astype(np.float32)),
            shape=(B, V, J, F, E),
        )
        return d

    @staticmethod
    def _xla_pos(d, pj, feat, return_blended=False):
        import jax.numpy as jnp

        B, V, J, F, E = d['shape']
        homog = jnp.einsum('cvf,fb->cvb', d['consts'], feat)
        blended = jnp.einsum('vj,xjb->xvb', d['wts'], pj).reshape(3, 4, V, B)
        pos = jnp.einsum('acvb,cvb->avb', blended, homog)
        return (pos, blended) if return_blended else pos

    def _assert_close(self, gk, gx):
        for a, b in zip(gk, gx):
            scale = max(1.0, float(np.abs(np.asarray(b)).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4
            )

    def test_lbs_points_vjp(self):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()

        def loss_k(pj, feat):
            return jnp.sum(jnp.sin(
                K.lbs_points(pj, feat, d['wts'], d['consts'], interpret=True)
            ))

        def loss_x(pj, feat):
            return jnp.sum(jnp.sin(self._xla_pos(d, pj, feat)))

        gk = jax.grad(loss_k, argnums=(0, 1))(d['pj'], d['feat'])
        gx = jax.grad(loss_x, argnums=(0, 1))(d['pj'], d['feat'])
        self._assert_close(gk, gx)

    def test_rhs_moments_vjp(self):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()

        def loss_k(tgt, pj, feat):
            r, y = K.rhs_moments(tgt, pj, feat, d['wts'], d['consts'],
                                 d['sd_cm'], interpret=True)
            # Arguments are normalized before the nonlinearity: r reaches ~1e3
            # and the kernel's 3-pass bf16 dots differ from exact f32 at
            # ~1e-5 relative, which sin/cos at raw scale would amplify
            # chaotically into the gradients.
            return jnp.sum(jnp.sin(r * 1e-3)) + jnp.sum(jnp.cos(y * 1e-2))

        def loss_x(tgt, pj, feat):
            pos, blended = self._xla_pos(d, pj, feat, return_blended=True)
            b = tgt - pos
            g = jnp.einsum('acvb,avb->cvb', blended[:, :3], b)
            r = jnp.einsum('cve,cvb->eb', d['sd_cm'], g)
            y = jnp.einsum('avb,vj->ajb', b, d['wts'])
            return jnp.sum(jnp.sin(r * 1e-3)) + jnp.sum(jnp.cos(y * 1e-2))

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        self._assert_close(gk, gx)

    def test_recon_part_sums_vjp(self):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()
        B, V, J, F, E = d['shape']
        rng = np.random.default_rng(2)
        pm = np.zeros((J, V), np.float32)
        pm[rng.integers(0, J, V), np.arange(V)] = 1.0
        pm = jnp.asarray(pm)

        def loss_k(tgt, pj, feat):
            raw, st, sa = K.recon_part_sums(tgt, pj, feat, d['wts'], d['consts'],
                                            pm, interpret=True)
            return (jnp.sum(jnp.sin(raw * 1e-2)) + jnp.sum(st**2) * 1e-4
                    + jnp.sum(jnp.cos(sa * 1e-2)))

        def loss_x(tgt, pj, feat):
            pos = self._xla_pos(d, pj, feat)  # (3, V, B)
            raw = jnp.einsum('jv,cvb,dvb->bjcd', pm, tgt, pos)
            st = jnp.einsum('jv,cvb->bjc', pm, tgt)
            sa = jnp.einsum('jv,cvb->bjc', pm, pos)
            return (jnp.sum(jnp.sin(raw * 1e-2)) + jnp.sum(st**2) * 1e-4
                    + jnp.sum(jnp.cos(sa * 1e-2)))

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        self._assert_close(gk, gx)

    @pytest.mark.parametrize('unbatched_ref', [False, True])
    def test_part_sums_vjp(self, unbatched_ref):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()
        B, V, J, F, P = d['shape']
        rng = np.random.default_rng(1)
        pm = np.zeros((J, V), np.float32)
        pm[rng.integers(0, J, V), np.arange(V)] = 1.0
        pm = jnp.asarray(pm)
        Ba = 1 if unbatched_ref else B
        a_vm = jnp.asarray(rng.normal(size=(3, V, Ba)).astype(np.float32))

        def loss_k(t, a):
            raw, st, sa = K.part_sums_vm(t, a, pm, interpret=True)
            return jnp.sum(jnp.sin(raw)) + jnp.sum(st**2) + jnp.sum(jnp.cos(sa))

        def loss_x(t, a):
            a_full = jnp.broadcast_to(a, (3, V, B))
            raw = jnp.einsum('jv,cvb,dvb->bjcd', pm, t, a_full)
            st = jnp.einsum('jv,cvb->bjc', pm, t)
            sa = jnp.einsum('jv,cvb->bjc', pm, a)
            return jnp.sum(jnp.sin(raw)) + jnp.sum(st**2) + jnp.sum(jnp.cos(sa))

        gk = jax.grad(loss_k, argnums=(0, 1))(d['tgt'], a_vm)
        gx = jax.grad(loss_x, argnums=(0, 1))(d['tgt'], a_vm)
        self._assert_close(gk, gx)

    def test_fit_grad_kernels_vs_xla(self, smpl_model):
        """Gradient through the FULL fit with kernels (interpret) must match
        the XLA-path gradient."""
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(3)
        pose = rng.normal(0, 0.1, (8, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (8, 10)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        tj = jnp.asarray(res['joints'])

        def make_loss(use_kernels):
            def loss(tv):
                fit = fitter.fit(
                    tv, tj, num_iter=2, beta_regularizer=0.0,
                    use_kernels=use_kernels,
                    requested_keys=['shape_betas', 'trans'],
                )
                return jnp.sum(fit['shape_betas'] ** 2) + jnp.sum(fit['trans'] ** 2)
            return loss

        tv = jnp.asarray(res['vertices'])
        g_xla = jax.grad(make_loss(False))(tv)
        # autodiff_policy='kernels' opts back into the fused backward kernels
        # (the default 'fallback' would silently route this to the XLA path).
        lbs_kernels.FORCE_INTERPRET = True
        lbs_kernels.autodiff_policy = 'kernels'
        try:
            g_kernel = jax.grad(make_loss(True))(tv)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
            lbs_kernels.autodiff_policy = 'fallback'
        scale = float(np.abs(np.asarray(g_xla)).max())
        np.testing.assert_allclose(
            np.asarray(g_kernel) / scale, np.asarray(g_xla) / scale, atol=2e-3
        )


class TestCachedHomogKernels:
    """posed_template_lm + the cached-homog rhs kernel (the large-F pipeline
    that stops re-streaming the (4, V_pad, F) constants per batch tile)."""

    _setup = TestKernelVJPs._setup
    _xla_pos = staticmethod(TestKernelVJPs._xla_pos)
    _assert_close = TestKernelVJPs._assert_close

    def test_posed_template_matches_einsum(self):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()
        h = K.posed_template_lm(d['feat'], d['consts'], True)  # Pallas path
        h_x = K.posed_template_lm(d['feat'], d['consts'])      # XLA fallback
        h_ref = jnp.einsum('cvf,fb->cvb', d['consts'][:3], d['feat'])
        scale = float(np.abs(np.asarray(h_ref)).max())
        np.testing.assert_allclose(
            np.asarray(h) / scale, np.asarray(h_ref) / scale, atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(h_x) / scale, np.asarray(h_ref) / scale, atol=5e-5
        )
        # Linear-map VJP (the bitmask splits are not differentiable, so the
        # custom VJP must carry the gradient).
        g = jax.grad(lambda f: jnp.sum(jnp.sin(
            K.posed_template_lm(f, d['consts']) * 0.1)))(d['feat'])
        g_ref = jax.grad(lambda f: jnp.sum(jnp.sin(
            jnp.einsum('cvf,fb->cvb', d['consts'][:3], f) * 0.1)))(d['feat'])
        self._assert_close((g,), (g_ref,))

    def test_rhs_cached_matches_uncached(self):
        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()
        h = K.posed_template_lm(d['feat'], d['consts'], True)
        r0, y0 = K.rhs_moments(
            d['tgt'], d['pj'], d['feat'], d['wts'], d['consts'], d['sd_cm'],
            interpret=True,
        )
        r1, y1 = K.rhs_moments_cached(
            d['tgt'], d['pj'], h, d['wts'], d['sd_cm'], interpret=True,
        )
        # Same math; the posed template's split rounding differs (mantissa
        # truncation vs RTN), so agreement is at the emulation error floor.
        sr = max(1.0, float(np.abs(np.asarray(r0)).max()))
        np.testing.assert_allclose(
            np.asarray(r1) / sr, np.asarray(r0) / sr, atol=5e-5
        )
        sy = max(1.0, float(np.abs(np.asarray(y0)).max()))
        np.testing.assert_allclose(
            np.asarray(y1) / sy, np.asarray(y0) / sy, atol=5e-5
        )

    def test_rhs_cached_vjp(self):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        d = self._setup()

        def loss_k(tgt, pj, feat):
            h = K.posed_template_lm(feat, d['consts'], True)
            r, y = K.rhs_moments_cached(tgt, pj, h, d['wts'], d['sd_cm'],
                                        interpret=True)
            return jnp.sum(jnp.sin(r * 1e-3)) + jnp.sum(jnp.cos(y * 1e-2))

        def loss_x(tgt, pj, feat):
            pos, blended = self._xla_pos(d, pj, feat, return_blended=True)
            b = tgt - pos
            g = jnp.einsum('acvb,avb->cvb', blended[:, :3], b)
            r = jnp.einsum('cve,cvb->eb', d['sd_cm'], g)
            y = jnp.einsum('avb,vj->ajb', b, d['wts'])
            return jnp.sum(jnp.sin(r * 1e-3)) + jnp.sum(jnp.cos(y * 1e-2))

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(d['tgt'], d['pj'], d['feat'])
        # The cached pipeline treats the 4th homog channel as the literal
        # constant 1, so the cotangent onto feat's CONSTANT last row (which
        # the fit discards — the row is pinned to 1) is absent by design;
        # compare everything else.
        gk = (gk[0], gk[1], gk[2][:-1])
        gx = (gx[0], gx[1], gx[2][:-1])
        self._assert_close(gk, gx)


class TestGramAssembly:
    @pytest.mark.parametrize('has_joints', [False, True])
    def test_matches_ref(self, has_joints):
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        rng = np.random.default_rng(6)
        B, J, E = 16, 24, 10
        J3 = J * 3
        R = rng.normal(size=(3, J3, B)).astype(np.float32)
        T = rng.normal(size=(3, E * J, B)).astype(np.float32)
        y = rng.normal(size=(3, J, B)).astype(np.float32)
        if has_joints:
            P = rng.normal(size=(3, E * J, B)).astype(np.float32)
            bJ = rng.normal(size=(3, J, B)).astype(np.float32)
        else:
            P = np.zeros((3, 1, B), np.float32)
            bJ = np.zeros((3, 1, B), np.float32)
        ksd = rng.normal(size=(J3 * J3, E * E)).astype(np.float32)
        lz = rng.normal(size=(J3, E * J)).astype(np.float32)
        sd1 = rng.normal(size=(J3, E)).astype(np.float32)
        q = rng.normal(size=(J, J)).astype(np.float32)
        w1 = rng.uniform(0, 1, size=(J, 1)).astype(np.float32)
        args = [jnp.asarray(x) for x in (R, T, y, P, bJ, ksd, lz, sd1, q, w1)]
        out_k = K.gram_assembly(*args, has_joints=has_joints, interpret=True)
        out_r = K.gram_assembly_ref(*args, has_joints=has_joints)
        for a, b in zip(out_k, out_r):
            scale = max(1.0, float(np.abs(np.asarray(b)).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4
            )

    def test_vjp_matches_ref(self):
        import jax
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        rng = np.random.default_rng(7)
        B, J, E = 8, 12, 5
        J3 = J * 3
        statics = (
            jnp.asarray(rng.normal(size=(J3 * J3, E * E)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(J3, E * J)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(J3, E)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(J, J)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, size=(J, 1)).astype(np.float32)),
        )
        R = jnp.asarray(rng.normal(size=(3, J3, B)).astype(np.float32))
        T = jnp.asarray(rng.normal(size=(3, E * J, B)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(3, J, B)).astype(np.float32))
        P = jnp.asarray(rng.normal(size=(3, E * J, B)).astype(np.float32))
        bJ = jnp.asarray(rng.normal(size=(3, J, B)).astype(np.float32))

        def loss_k(R, T, y, P, bJ):
            G, SA, rb, Sb = K.gram_assembly(
                R, T, y, P, bJ, *statics, has_joints=True, interpret=True
            )
            return (jnp.sum(jnp.sin(G * 1e-2)) + jnp.sum(SA**2) * 1e-4
                    + jnp.sum(jnp.cos(rb * 1e-2)) + jnp.sum(Sb**2) * 1e-4)

        def loss_r(R, T, y, P, bJ):
            G, SA, rb, Sb = K.gram_assembly_ref(
                R, T, y, P, bJ, *statics, has_joints=True
            )
            return (jnp.sum(jnp.sin(G * 1e-2)) + jnp.sum(SA**2) * 1e-4
                    + jnp.sum(jnp.cos(rb * 1e-2)) + jnp.sum(Sb**2) * 1e-4)

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(R, T, y, P, bJ)
        gx = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(R, T, y, P, bJ)
        for a, b in zip(gk, gx):
            scale = max(1.0, float(np.abs(np.asarray(b)).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4
            )


class TestForcedKernelFitVerticesOnly:
    def test_fit_without_joints(self, smpl_model):
        """Vertices-only fit through the lane-major kernel path (joints
        regressed from the meshes, recon materialized vertex-major)."""
        from smplfitter_tpu import BodyFitter
        from smplfitter_tpu.ops import lbs_kernels

        fitter = BodyFitter(smpl_model)
        rng = np.random.default_rng(9)
        pose = rng.normal(0, 0.1, (8, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (8, 10)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        kwargs = dict(num_iter=2, beta_regularizer=0.0, final_adjust_rots=True,
                      requested_keys=['pose_rotvecs', 'shape_betas', 'trans'])
        plain = fitter.fit(res['vertices'], None, **kwargs)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            kernel = fitter.fit(res['vertices'], None, **kwargs)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        np.testing.assert_allclose(
            np.asarray(kernel['shape_betas']), np.asarray(plain['shape_betas']),
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(kernel['trans']), np.asarray(plain['trans']), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(kernel['pose_rotvecs']), np.asarray(plain['pose_rotvecs']),
            atol=5e-3,
        )


class TestBackwardVertexChunkHalving:
    """The backward kernels halve their vertex chunk whenever the batch grid
    has more than one tile (lbs_kernels._bwd_vc) — the regime where Mosaic
    double-buffers the batch-indexed blocks and the full-chunk kernels
    overflow scoped VMEM. Fits decompose per batch instance, so the B=512
    call (vc=128, grid > 1) must agree with a B=256 call (vc=256, single
    tile) on the shared instances."""

    def test_bwd_halved_chunk_matches_full(self):
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        assert K._bwd_vc(512, 256) == K.VC // 2
        assert K._bwd_vc(256, 256) == K.VC

        rng = np.random.default_rng(0)
        V, J, E, F, B = 700, 24, 10, 208, 512
        v_pad = -(-V // K.VC) * K.VC
        tgt = jnp.asarray(rng.normal(size=(3, V, B)).astype(np.float32))
        pj = jnp.asarray(rng.normal(size=(12, J, B)).astype(np.float32))
        feat = jnp.asarray(rng.normal(size=(F, B)).astype(np.float32))
        w = np.zeros((v_pad, J), np.float32)
        w[:V] = rng.random((V, J)).astype(np.float32)
        w = jnp.asarray(w)
        consts = jnp.asarray(rng.normal(size=(4, v_pad, F)).astype(np.float32))
        sd = jnp.asarray(rng.normal(size=(3, v_pad, E)).astype(np.float32))
        gr = jnp.asarray(rng.normal(size=(E, B)).astype(np.float32))
        gy = jnp.asarray(rng.normal(size=(3, J, B)).astype(np.float32))

        full = K._rhs_moments_bwd(
            tgt, pj, feat, w, consts, sd, gr, gy, interpret=True
        )
        half = K._rhs_moments_bwd(
            tgt[..., :256], pj[..., :256], feat[..., :256], w, consts, sd,
            gr[..., :256], gy[..., :256], interpret=True,
        )
        for a, b in zip(full, half):
            a = np.asarray(a)[..., :256]
            b = np.asarray(b)
            # f32 accumulation-order noise only: magnitudes are ~1e4 here,
            # so compare relative to the output scale.
            scale = np.max(np.abs(b)) or 1.0
            assert np.max(np.abs(a - b)) <= 1e-5 * scale
