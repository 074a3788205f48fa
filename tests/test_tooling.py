"""Tooling-layer tests: decimation, vertex subsets, regressor training, caches."""

from __future__ import annotations

import os.path as osp

import numpy as np
import pytest


class TestDecimation:
    def test_farthest_point_sampling(self):
        from smplfitter_tpu.utils.decimation import farthest_point_sampling

        rng = np.random.default_rng(0)
        pts = rng.normal(size=(500, 3))
        idx = farthest_point_sampling(pts, 64)
        assert len(np.unique(idx)) == 64
        assert idx.max() < 500

    def test_decimate(self, smpl_model):
        from smplfitter_tpu.utils.decimation import decimate

        v = np.asarray(smpl_model.v_template)
        faces = np.asarray(smpl_model.faces)
        subset, dec_faces = decimate(v, faces, 128)
        assert len(subset) == 128
        assert dec_faces.max() < 128 if len(dec_faces) else True


class TestVertexSubset:
    def test_subset_model(self, body_models_dir, smpl_model):
        from smplfitter_tpu import BodyModel

        subset = np.arange(0, smpl_model.num_vertices, 3)
        bm = BodyModel('smpl', 'neutral', vertex_subset=subset)
        assert bm.num_vertices == len(subset)
        pose = np.zeros((1, 72), np.float32)
        betas = np.zeros((1, 10), np.float32)
        res_sub = bm(pose_rotvecs=pose, shape_betas=betas)
        res_full = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        np.testing.assert_allclose(
            np.asarray(res_sub['vertices']),
            np.asarray(res_full['vertices'])[:, subset],
            atol=1e-6,
        )

    def test_subset_fit(self, body_models_dir, smpl_model):
        from smplfitter_tpu import BodyModel, BodyFitter

        subset = np.arange(0, smpl_model.num_vertices, 2)
        bm = BodyModel('smpl', 'neutral', vertex_subset=subset)
        fitter = BodyFitter(bm)
        rng = np.random.default_rng(80)
        pose = rng.normal(0, 0.1, (2, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (2, 10)).astype(np.float32)
        res = bm(pose_rotvecs=pose, shape_betas=betas)
        fit = fitter.fit(
            target_vertices=res['vertices'],
            target_joints=res['joints'],
            num_iter=3,
            beta_regularizer=0.0,
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
        # Reference achieves 0.045 on this synthetic subset config.
        assert err < 8e-2

    def test_subset_size_creates_files(self, body_models_dir):
        from smplfitter_tpu import BodyModel

        bm = BodyModel('smpl', 'neutral', vertex_subset_size=96)
        assert bm.num_vertices == 96
        assert osp.exists(osp.join(body_models_dir, 'smpl', 'vertex_subset_96.npz'))


class TestRegressorTraining:
    def test_train_post_lbs_regressor(self, smpl_model):
        from smplfitter_tpu.utils.joint_regressor_training import (
            train_post_lbs_regressor,
        )

        subset = np.arange(0, smpl_model.num_vertices, 2)
        reg = train_post_lbs_regressor(
            smpl_model, subset, num_steps=60, finetune_steps=30, batch_size=16
        )
        assert reg.shape == (24, len(subset))
        # Convex rows.
        np.testing.assert_allclose(reg.sum(axis=1), 1.0, atol=1e-5)
        assert np.all(reg >= 0)
        # The learned regressor should locate joints reasonably on new poses.
        rng = np.random.default_rng(81)
        pose = rng.normal(0, 0.2, (4, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (4, 10)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        pred = np.einsum('jv,bvc->bjc', reg, np.asarray(res['vertices'])[:, subset])
        err = np.linalg.norm(pred - np.asarray(res['joints']), axis=-1).mean()
        assert err < 0.1, f'regressed joint error {err}'


class TestPrecisionConfig:
    def test_set_matmul_precision(self):
        import smplfitter_tpu

        assert smplfitter_tpu.get_matmul_precision() == 'highest'
        smplfitter_tpu.set_matmul_precision('default')
        try:
            assert smplfitter_tpu.get_matmul_precision() == 'default'
        finally:
            smplfitter_tpu.set_matmul_precision('highest')


class TestCachedFitFn:
    def test_cached_fit_fn(self, body_models_dir, smpl_model):
        from smplfitter_tpu import get_cached_fit_fn

        fit_fn = get_cached_fit_fn(num_iter=2, num_betas=10)
        fit_fn2 = get_cached_fit_fn(num_iter=2, num_betas=10)
        assert fit_fn is fit_fn2

        rng = np.random.default_rng(82)
        pose = rng.normal(0, 0.1, (2, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (2, 10)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        out = fit_fn(res['vertices'], res['joints'])
        assert set(out) >= {'pose_rotvecs', 'shape_betas', 'trans'}

        # Leading-dim reshaping: (2, 3) leading dims round-trip.
        verts5 = np.broadcast_to(
            np.asarray(res['vertices'])[None], (3, 2, smpl_model.num_vertices, 3)
        )
        out5 = fit_fn(verts5)
        assert out5['shape_betas'].shape[:2] == (3, 2)

    def test_ragged_fit_fn(self, body_models_dir, smpl_model):
        """Variable-length sequences through the bucketed ragged wrapper must
        equal per-sequence flat fits (padding + mask must not leak)."""
        from smplfitter_tpu import get_cached_fit_fn

        fit_fn = get_cached_fit_fn(num_iter=2, num_betas=10)
        rng = np.random.default_rng(83)
        lengths = [3, 5, 2]
        seqs_v, seqs_j = [], []
        for t in lengths:
            pose = rng.normal(0, 0.1, (t, 72)).astype(np.float32)
            betas = rng.normal(0, 1, (t, 10)).astype(np.float32)
            res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
            seqs_v.append(np.asarray(res['vertices']))
            seqs_j.append(np.asarray(res['joints']))
        out = fit_fn.ragged(seqs_v, seqs_j)
        assert [v.shape[0] for v in out['shape_betas']] == lengths
        flat = fit_fn(np.concatenate(seqs_v), np.concatenate(seqs_j))
        np.testing.assert_allclose(
            np.concatenate([np.asarray(x) for x in out['shape_betas']]),
            np.asarray(flat['shape_betas']), atol=5e-4,
        )

    def test_ragged_share_beta_exact(self, body_models_dir, smpl_model):
        """share_beta through the ragged wrapper: the zero-mask padding must
        reproduce the unpadded shared solution."""
        from smplfitter_tpu import get_cached_fit_fn

        fit_fn = get_cached_fit_fn(
            num_iter=2, num_betas=10, share_beta=True, beta_regularizer=0.1
        )
        rng = np.random.default_rng(84)
        betas = np.broadcast_to(
            rng.normal(0, 1, (1, 10)).astype(np.float32), (5, 10)
        ).copy()
        pose = rng.normal(0, 0.1, (5, 72)).astype(np.float32)
        res = smpl_model(pose_rotvecs=pose, shape_betas=betas)
        tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])
        out = fit_fn.ragged([tv[:2], tv[2:]], [tj[:2], tj[2:]])
        got = np.concatenate([np.asarray(x) for x in out['shape_betas']])
        # Direct unpadded call (batch 5 itself pads through the masked path,
        # batch 8 bucket here) — compare against the batch-major XLA solve.
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(smpl_model)
        want = fitter.fit(
            tv, tj, num_iter=2, share_beta=True, beta_regularizer=0.1,
            use_kernels=False, requested_keys=('shape_betas',),
        )
        np.testing.assert_allclose(
            got, np.asarray(want['shape_betas']), atol=5e-4
        )
        assert float(np.std(got, axis=0).max()) < 1e-5


class TestPickleCompatShims:
    def _fake_chumpy_pickle(self, attrs, clsname='Ch', modname='chumpy.ch'):
        """Pickle an object whose class claims to live at chumpy.ch/reordering,
        as the official model files do — without chumpy installed."""
        import pickle
        import sys
        import types

        mods = {'chumpy': types.ModuleType('chumpy'), modname: types.ModuleType(modname)}
        cls = type(clsname, (), {'__module__': modname, '__qualname__': clsname})
        setattr(mods[modname], clsname, cls)
        obj = cls()
        for k, v in attrs.items():
            setattr(obj, k, v)
        saved = {n: sys.modules.get(n) for n in mods}
        sys.modules.update(mods)
        try:
            return pickle.dumps({'payload': obj})
        finally:
            for n, old in saved.items():
                if old is None:
                    sys.modules.pop(n, None)
                else:
                    sys.modules[n] = old

    def test_chumpy_ch_roundtrip(self):
        import pickle

        from smplfitter_tpu.utils.modeldata import chumpy_stub_modules

        data = self._fake_chumpy_pickle({'x': np.arange(6.0).reshape(2, 3)})
        with pytest.raises(ModuleNotFoundError):
            pickle.loads(data)  # chumpy really is absent
        with chumpy_stub_modules():
            loaded = pickle.loads(data)['payload']
        np.testing.assert_array_equal(np.asarray(loaded), np.arange(6.0).reshape(2, 3))

    def test_chumpy_select_roundtrip(self):
        import pickle

        from smplfitter_tpu.utils.modeldata import chumpy_stub_modules

        data = self._fake_chumpy_pickle(
            {'a': np.arange(12.0), 'idxs': np.array([3, 5, 7, 9]),
             'preferred_shape': (2, 2)},
            clsname='Select', modname='chumpy.reordering',
        )
        with chumpy_stub_modules():
            loaded = pickle.loads(data)['payload']
        np.testing.assert_array_equal(
            np.asarray(loaded), np.array([[3.0, 5.0], [7.0, 9.0]])
        )

    def test_scipy_sparse_submodule_alias(self):
        import pickle
        import sys

        from smplfitter_tpu.utils.modeldata import scipy_sparse_forward_compat

        assert 'scipy.sparse.coo' not in sys.modules or True  # env-dependent
        with scipy_sparse_forward_compat():
            import scipy.sparse

            assert sys.modules['scipy.sparse.coo'] is scipy.sparse
            assert sys.modules['scipy.sparse.csr'] is scipy.sparse
        # restored afterwards
        import importlib.util
        if importlib.util.find_spec('scipy.sparse.coo') is None:
            assert sys.modules.get('scipy.sparse.coo') is not scipy.sparse or (
                'scipy.sparse.coo' not in sys.modules
            )
        # An old-path pickle loads under the shim.
        import scipy.sparse as sp
        m = sp.coo_matrix(np.eye(2))
        # Protocol 2: module paths are length-free text opcodes, so the
        # old-submodule rename below doesn't corrupt framing.
        raw = pickle.dumps(m, protocol=2)
        patched = raw.replace(b'scipy.sparse._coo', b'scipy.sparse.coo')
        with scipy_sparse_forward_compat():
            out = pickle.loads(patched)
        np.testing.assert_array_equal(out.toarray(), np.eye(2))
