"""Env-gated tests against REAL licensed model files.

These run only when real body model files are available (licensing forbids
shipping them; cf. the reference's DATA_ROOT-gated tests). Point
``SMPLFITTER_REAL_BODY_MODELS`` at a real ``body_models`` directory to enable.
When the reference implementation is also present, outputs are compared
directly against its NumPy backend on the same files.
"""

from __future__ import annotations

import os
import os.path as osp
import sys

import numpy as np
import pytest

REAL_DIR = os.environ.get('SMPLFITTER_REAL_BODY_MODELS')
pytestmark = pytest.mark.skipif(
    REAL_DIR is None or not osp.isdir(REAL_DIR or ''),
    reason='real body model files not available '
    '(set SMPLFITTER_REAL_BODY_MODELS)',
)


@pytest.fixture(scope='module')
def real_smpl():
    from smplfitter_tpu import BodyModel

    return BodyModel('smpl', 'neutral', model_root=osp.join(REAL_DIR, 'smpl'))


class TestRealSMPL:
    def test_constants(self, real_smpl):
        assert real_smpl.num_vertices == 6890
        assert real_smpl.num_joints == 24

    def test_fit_roundtrip_tight(self, real_smpl):
        """On the real model, the reference's 5e-3 m round-trip bound applies."""
        from smplfitter_tpu import BodyFitter

        fitter = BodyFitter(real_smpl)
        rng = np.random.default_rng(0)
        pose = rng.normal(0, 0.1, (2, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (2, 10)).astype(np.float32)
        trans = rng.normal(0, 0.5, (2, 3)).astype(np.float32)
        res = real_smpl(pose_rotvecs=pose, shape_betas=betas, trans=trans)
        fit = fitter.fit(
            res['vertices'], res['joints'], num_iter=3, beta_regularizer=0.0,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        rec = real_smpl(
            pose_rotvecs=fit['pose_rotvecs'],
            shape_betas=fit['shape_betas'],
            trans=fit['trans'],
        )
        err = np.linalg.norm(
            np.asarray(rec['vertices']) - np.asarray(res['vertices']), axis=-1
        ).mean()
        assert err < 5e-3, f'real-SMPL round-trip error {err}'

    def test_forward_matches_reference(self, real_smpl):
        if not osp.isdir('/root/reference/src'):
            pytest.skip('reference not available')
        sys.path.insert(0, '/root/reference/src')
        os.environ['SMPLFITTER_BODY_MODELS'] = REAL_DIR
        import smplfitter.np as ref_np

        ref_bm = ref_np.BodyModel('smpl', 'neutral', model_root=osp.join(REAL_DIR, 'smpl'))
        rng = np.random.default_rng(1)
        pose = rng.normal(0, 0.3, (2, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (2, 10)).astype(np.float32)
        ours = real_smpl(pose_rotvecs=pose, shape_betas=betas)
        ref = ref_bm(pose_rotvecs=pose, shape_betas=betas)
        np.testing.assert_allclose(
            np.asarray(ours['vertices']), ref['vertices'], atol=2e-6
        )
