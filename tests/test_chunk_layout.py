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
        layout_host = CL.build_chunk_layout(w, parents, chunk=K.VC)
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
