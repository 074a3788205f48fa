"""Joint-subset blend layout: the per-chunk K-sliced kernels must match the
full-width (degenerate-layout) kernels exactly up to f32-emulation noise.

Covers ops/chunk_layout.py (DFS reorder + range computation) and the
``layout=`` path of every blend-consuming kernel (interpret mode on CPU).
"""

from __future__ import annotations

import numpy as np
import pytest


def _make_tree_weights(rng, V, J, parents):
    """Skinning weights supported on {assign, parent, grandparent} — the
    locality structure the layout exploits (same shape as the synthetic
    models')."""
    assign = rng.integers(0, J, V)
    parents = np.asarray(parents)
    w = np.zeros((V, J), np.float32)
    w[np.arange(V), assign] = 0.7
    w[np.arange(V), parents[assign]] += 0.2
    w[np.arange(V), parents[parents[assign]]] += 0.1
    return w / w.sum(axis=1, keepdims=True)


class TestChunkLayout:
    def _setup(self, seed=0):
        import jax.numpy as jnp

        from smplfitter_tpu.ops import chunk_layout as CL
        from smplfitter_tpu.ops import lbs_kernels as K

        rng = np.random.default_rng(seed)
        B, V, J, E = 16, 1024, 24, 11
        # a chain tree: DFS ranges are short, so the layout is non-degenerate
        parents = [0] + list(range(J - 1))
        w = _make_tree_weights(rng, V, J, parents)
        # sort_vertices=True: exercise the fully-permuted machinery (vperm
        # gathers included); the production default only subsets when the
        # canonical order is already coherent.
        layout_host = CL.build_chunk_layout(w, parents, chunk=K.VC,
                                            sort_vertices=True)
        assert not layout_host.degenerate, 'test needs a real subset layout'

        F = 20
        tgt = rng.normal(size=(B, V, 3)).astype(np.float32)
        pj = rng.normal(size=(12, J, B)).astype(np.float32)
        feat = rng.normal(size=(F, B)).astype(np.float32)
        consts = rng.normal(size=(4, V, F)).astype(np.float32)
        feat[-1] = 1.0
        consts[3] = 0.0
        consts[3, :, -1] = 1.0
        sd = rng.normal(size=(3, V, E)).astype(np.float32)

        # Permute the per-vertex operands into the layout's vertex order.
        vp = layout_host.vperm
        w_p = w[vp]
        consts_p = consts[:, vp]
        sd_p = sd[:, vp]
        tgt_p = tgt[:, vp]

        # build_blend_operands permutes internally from CANONICAL weights:
        wtsp_sub, w_sub, starts = CL.build_blend_operands(w, layout_host, V)
        layout = K.BlendLayout(
            wtsp_sub=jnp.asarray(wtsp_sub), w_sub=jnp.asarray(w_sub),
            starts=jnp.asarray(starts), jr=layout_host.jr, jp=layout_host.jp,
            jperm=tuple(int(x) for x in layout_host.jperm),
        )
        return K, jnp, dict(
            B=B, V=V, J=J, E=E, F=F, layout=layout, tgt=tgt, tgt_p=tgt_p,
            pj=pj, feat=feat, w=w, w_p=w_p, consts=consts, consts_p=consts_p,
            sd=sd, sd_p=sd_p, vperm=vp,
        )

    def test_lbs_points_matches_full(self):
        K, jnp, d = self._setup()
        full = K.lbs_points(
            jnp.asarray(d['pj']), jnp.asarray(d['feat']),
            jnp.asarray(d['w']), jnp.asarray(d['consts']), interpret=True,
        )
        sub = K.lbs_points(
            jnp.asarray(d['pj']), jnp.asarray(d['feat']),
            jnp.asarray(d['w_p']), jnp.asarray(d['consts_p']),
            interpret=True, layout=d['layout'],
        )
        # subset output rows are in the layout's vertex order
        full_p = np.asarray(full)[:, d['vperm']]
        np.testing.assert_allclose(np.asarray(sub), full_p, rtol=2e-4, atol=2e-4)

    def test_rhs_moments_matches_full(self):
        K, jnp, d = self._setup(seed=1)
        r0, y0 = K.rhs_moments(
            K.to_vertex_major(jnp.asarray(d['tgt']), d['V']),
            jnp.asarray(d['pj']), jnp.asarray(d['feat']), jnp.asarray(d['w']),
            jnp.asarray(d['consts']), jnp.asarray(d['sd']), interpret=True,
        )
        r1, y1 = K.rhs_moments(
            jnp.asarray(d['tgt_p'].transpose(2, 1, 0)),
            jnp.asarray(d['pj']), jnp.asarray(d['feat']),
            jnp.asarray(d['w_p']), jnp.asarray(d['consts_p']),
            jnp.asarray(d['sd_p']), interpret=True, layout=d['layout'],
        )
        sr = np.max(np.abs(np.asarray(r0)))
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                                   rtol=2e-4, atol=5e-5 * sr)
        sy = np.max(np.abs(np.asarray(y0)))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=5e-5 * sy)

    def test_recon_part_sums_matches_full(self):
        K, jnp, d = self._setup(seed=2)
        rng = np.random.default_rng(3)
        J, V = d['J'], d['V']
        pm = np.zeros((J, V), np.float32)
        pm[rng.integers(0, J, V), np.arange(V)] = 1.0
        out0 = K.recon_part_sums_lm(
            K.to_vertex_major(jnp.asarray(d['tgt']), V),
            jnp.asarray(d['pj']), jnp.asarray(d['feat']), jnp.asarray(d['w']),
            jnp.asarray(d['consts']), jnp.asarray(pm), interpret=True,
        )
        pm_p = pm[:, d['vperm']]
        out1 = K.recon_part_sums_lm(
            jnp.asarray(d['tgt_p'].transpose(2, 1, 0)),
            jnp.asarray(d['pj']), jnp.asarray(d['feat']),
            jnp.asarray(d['w_p']), jnp.asarray(d['consts_p']),
            jnp.asarray(pm_p), interpret=True, layout=d['layout'],
        )
        for a, b in zip(out1, out0):
            s = max(np.max(np.abs(np.asarray(b))), 1e-6)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=1e-4 * s)

    def test_vjp_matches_full(self):
        import jax

        K, jnp, d = self._setup(seed=4)
        tgt_vm_p = jnp.asarray(d['tgt_p'].transpose(2, 1, 0))
        tgt_vm = K.to_vertex_major(jnp.asarray(d['tgt']), d['V'])

        def loss_full(pj, feat):
            r, y = K.rhs_moments(
                tgt_vm, pj, feat, jnp.asarray(d['w']),
                jnp.asarray(d['consts']), jnp.asarray(d['sd']), interpret=True)
            return jnp.sum(r ** 2) + jnp.sum(y ** 2)

        def loss_sub(pj, feat):
            r, y = K.rhs_moments(
                tgt_vm_p, pj, feat, jnp.asarray(d['w_p']),
                jnp.asarray(d['consts_p']), jnp.asarray(d['sd_p']),
                interpret=True, layout=d['layout'])
            return jnp.sum(r ** 2) + jnp.sum(y ** 2)

        g0 = jax.grad(loss_full, argnums=(0, 1))(
            jnp.asarray(d['pj']), jnp.asarray(d['feat']))
        g1 = jax.grad(loss_sub, argnums=(0, 1))(
            jnp.asarray(d['pj']), jnp.asarray(d['feat']))
        for a, b in zip(g1, g0):
            s = max(np.max(np.abs(np.asarray(b))), 1e-6)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=3e-4 * s)


class TestSortVerticesEndToEnd:
    """BodyFitter(sort_vertices=True) — the fully-permuted kernel operands +
    target-ingestion gather + output un-permute — must match the default
    fitter on every entry point (interpret-mode kernels; the synthetic
    models' scattered vertex order makes the sorted layout non-degenerate,
    so this exercises the real vperm machinery end-to-end)."""

    @pytest.fixture(scope='class')
    def fitters(self, smpl_model):
        import smplfitter_tpu

        f0 = smplfitter_tpu.BodyFitter(smpl_model)
        f1 = smplfitter_tpu.BodyFitter(smpl_model, sort_vertices=True)
        assert f1.plan.vperm is not None, (
            'synthetic model should yield a non-degenerate sorted layout'
        )
        assert f1.gram.blend_layout is not None
        assert f1.gram.blend_layout.jr < smpl_model.num_joints
        return f0, f1

    def _targets(self, smpl_model, seed=21, batch=16):
        from tests.conftest import random_params

        pose, betas, trans = random_params(batch, seed=seed, pose_std=0.2)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        return pose, betas, res

    def test_fit_matches_default(self, smpl_model, fitters):
        from smplfitter_tpu.ops import lbs_kernels

        f0, f1 = fitters
        _, _, res = self._targets(smpl_model)
        kw = dict(
            num_iter=2, beta_regularizer=1.0, final_adjust_rots=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans', 'vertices'),
        )
        lbs_kernels.FORCE_INTERPRET = True
        try:
            o0 = f0.fit(res['vertices'], res['joints'], **kw)
            o1 = f1.fit(res['vertices'], res['joints'], **kw)
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        for k in kw['requested_keys']:
            a, b = np.asarray(o0[k]), np.asarray(o1[k])
            s = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(b, a, atol=2e-3 * s, err_msg=k)

    def test_known_pose_and_shape_match_default(self, smpl_model, fitters):
        from smplfitter_tpu.ops import lbs_kernels

        f0, f1 = fitters
        pose, betas, res = self._targets(smpl_model, seed=22)
        lbs_kernels.FORCE_INTERPRET = True
        try:
            kp0 = f0.fit_with_known_pose(
                pose, res['vertices'], res['joints'], beta_regularizer=0.5)
            kp1 = f1.fit_with_known_pose(
                pose, res['vertices'], res['joints'], beta_regularizer=0.5)
            ks0 = f0.fit_with_known_shape(
                betas, res['vertices'], res['joints'], num_iter=2,
                requested_keys=('pose_rotvecs', 'trans'))
            ks1 = f1.fit_with_known_shape(
                betas, res['vertices'], res['joints'], num_iter=2,
                requested_keys=('pose_rotvecs', 'trans'))
        finally:
            lbs_kernels.FORCE_INTERPRET = False
        for k in ('shape_betas', 'trans'):
            np.testing.assert_allclose(
                np.asarray(kp1[k]), np.asarray(kp0[k]), atol=1e-3, err_msg=k)
        for k in ('pose_rotvecs', 'trans'):
            np.testing.assert_allclose(
                np.asarray(ks1[k]), np.asarray(ks0[k]), atol=2e-3, err_msg=k)


class TestHomogCache:
    """rhs_moments_h + recon_part_sums_cached_lm == the uncached kernels."""

    def _case(self, seed=7):
        import jax.numpy as jnp

        from smplfitter_tpu.ops import lbs_kernels as K

        rng = np.random.default_rng(seed)
        B, V, J, E = 16, 512, 24, 11
        F = 20
        tgt = rng.normal(size=(B, V, 3)).astype(np.float32)
        pj = rng.normal(size=(12, J, B)).astype(np.float32)
        feat = rng.normal(size=(F, B)).astype(np.float32)
        wts = rng.uniform(0, 1, size=(V, J)).astype(np.float32)
        consts = rng.normal(size=(4, V, F)).astype(np.float32)
        feat[-1] = 1.0
        consts[3] = 0.0
        consts[3, :, -1] = 1.0
        sd = rng.normal(size=(3, V, E)).astype(np.float32)
        x = rng.normal(size=(E, B)).astype(np.float32)
        pm = np.zeros((J, V), np.float32)
        pm[rng.integers(0, J, V), np.arange(V)] = 1.0
        return K, jnp, dict(B=B, V=V, J=J, E=E, F=F, tgt=tgt, pj=pj,
                            feat=feat, wts=wts, consts=consts, sd=sd, x=x,
                            pm=pm)

    def test_matches_uncached(self):
        K, jnp, d = self._case()
        tgt_vm = K.to_vertex_major(jnp.asarray(d['tgt']), d['V'])
        r0, y0 = K.rhs_moments(
            tgt_vm, jnp.asarray(d['pj']), jnp.asarray(d['feat']),
            jnp.asarray(d['wts']), jnp.asarray(d['consts']),
            jnp.asarray(d['sd']), interpret=True)
        r1, y1, homog = K.rhs_moments_h(
            tgt_vm, jnp.asarray(d['pj']), jnp.asarray(d['feat']),
            jnp.asarray(d['wts']), jnp.asarray(d['consts']),
            jnp.asarray(d['sd']), interpret=True)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)
        homog_ref = np.einsum('cvf,fb->cvb', d['consts'][:3], d['feat'])
        np.testing.assert_allclose(np.asarray(homog), homog_ref, rtol=2e-4,
                                   atol=2e-4 * np.abs(homog_ref).max())

        # cached recon (pj2 with x-shifted translations) vs uncached recon
        # with the equivalent full feature/consts
        consts_full = np.concatenate(
            [d['consts'], np.concatenate(
                [d['sd'], np.zeros((1, d['V'], d['E']), np.float32)],
                axis=0)], axis=2)
        feat_full = np.concatenate([d['feat'], d['x']], axis=0)
        out0 = K.recon_part_sums_lm(
            tgt_vm, jnp.asarray(d['pj']), jnp.asarray(feat_full),
            jnp.asarray(d['wts']), jnp.asarray(consts_full),
            jnp.asarray(d['pm']), interpret=True)
        out1 = K.recon_part_sums_cached_lm(
            tgt_vm, jnp.asarray(d['pj']), jnp.asarray(d['x']),
            jnp.asarray(d['sd']), homog, jnp.asarray(d['pm']),
            jnp.asarray(d['wts']), interpret=True)
        for a, b in zip(out1, out0):
            sc = max(np.abs(np.asarray(b)).max(), 1e-6)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-4, atol=3e-4 * sc)

    def test_vjp_matches_uncached(self):
        import jax

        K, jnp, d = self._case(seed=8)
        tgt_vm = K.to_vertex_major(jnp.asarray(d['tgt']), d['V'])
        consts_full = np.concatenate(
            [d['consts'], np.concatenate(
                [d['sd'], np.zeros((1, d['V'], d['E']), np.float32)],
                axis=0)], axis=2)

        def loss_cached(pj, feat, x):
            r, y, homog = K.rhs_moments_h(
                tgt_vm, pj, feat, jnp.asarray(d['wts']),
                jnp.asarray(d['consts']), jnp.asarray(d['sd']), interpret=True)
            raw, st, sa = K.recon_part_sums_cached_lm(
                tgt_vm, pj, x, jnp.asarray(d['sd']), homog,
                jnp.asarray(d['pm']), jnp.asarray(d['wts']), interpret=True)
            return (jnp.sum(r ** 2) + jnp.sum(y ** 2) + jnp.sum(raw ** 2)
                    + jnp.sum(st ** 2) + jnp.sum(sa ** 2))

        def loss_uncached(pj, feat, x):
            r, y = K.rhs_moments(
                tgt_vm, pj, feat, jnp.asarray(d['wts']),
                jnp.asarray(d['consts']), jnp.asarray(d['sd']), interpret=True)
            raw, st, sa = K.recon_part_sums_lm(
                tgt_vm, pj, jnp.concatenate([feat, x], axis=0),
                jnp.asarray(d['wts']), jnp.asarray(consts_full),
                jnp.asarray(d['pm']), interpret=True)
            return (jnp.sum(r ** 2) + jnp.sum(y ** 2) + jnp.sum(raw ** 2)
                    + jnp.sum(st ** 2) + jnp.sum(sa ** 2))

        args = (jnp.asarray(d['pj']), jnp.asarray(d['feat']),
                jnp.asarray(d['x']))
        g1 = jax.grad(loss_cached, argnums=(0, 1, 2))(*args)
        g0 = jax.grad(loss_uncached, argnums=(0, 1, 2))(*args)
        for a, b in zip(g1, g0):
            sc = max(np.abs(np.asarray(b)).max(), 1e-6)
            # Both paths run 2-3-pass bf16 f32-emulated dots in different
            # association orders; per-element noise up to ~2e-3 of the
            # gradient scale is the emulation floor, not a VJP defect.
            np.testing.assert_allclose(np.asarray(a) / sc, np.asarray(b) / sc,
                                       rtol=2e-3, atol=2e-3)
