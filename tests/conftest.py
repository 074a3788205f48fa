"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (the fake-multichip environment
for sharding tests), using synthetic model files written to a session tmp dir —
no licensed data needed. The reference implementation (if present at
/root/reference) loads the same synthetic files and serves as a numerical
oracle in parity tests.
"""

from __future__ import annotations

import os
import os.path as osp
import sys

# Must happen before jax initializes its backends. SMPLFITTER_TPU_TESTS=1
# keeps the real backend (for tests/test_tpu_grad.py on an attached TPU).
if os.environ.get('SMPLFITTER_TPU_TESTS') != '1':
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
    )
    os.environ['JAX_PLATFORMS'] = 'cpu'

    import jax

    jax.config.update('jax_platforms', 'cpu')
else:
    import jax

import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

REFERENCE_SRC = '/root/reference/src'
HAS_REFERENCE = osp.isdir(REFERENCE_SRC)

SYNTH_V_SMPL = 432
SYNTH_V_SMPLX = 660


@pytest.fixture(scope='session')
def body_models_dir(tmp_path_factory):
    """Session-scoped synthetic body_models directory, exported via env vars."""
    from smplfitter_tpu.utils import synthetic

    d = str(tmp_path_factory.mktemp('body_models'))
    synthetic.write_full_test_environment(
        d, num_vertices_smpl=SYNTH_V_SMPL, num_vertices_smplx=SYNTH_V_SMPLX
    )
    os.environ['SMPLFITTER_BODY_MODELS'] = d
    # Converter/flipper assets resolve via DATA_ROOT/body_models.
    os.environ['DATA_ROOT'] = osp.dirname(d)
    os.symlink(d, osp.join(osp.dirname(d), 'body_models'))
    yield d


@pytest.fixture(scope='session')
def smpl_model(body_models_dir):
    from smplfitter_tpu import BodyModel

    return BodyModel('smpl', 'neutral')


@pytest.fixture(scope='session')
def reference_np(body_models_dir):
    """The reference NumPy backend as an oracle, loading the same synthetic files."""
    if not HAS_REFERENCE:
        pytest.skip('reference implementation not available')
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import smplfitter.np as ref_np

    return ref_np


def random_params(batch_size=2, num_joints=24, num_betas=10, seed=0, pose_std=0.3):
    rng = np.random.default_rng(seed)
    pose = rng.normal(0, pose_std, (batch_size, num_joints * 3)).astype(np.float32)
    betas = rng.normal(0, 1, (batch_size, num_betas)).astype(np.float32)
    trans = rng.normal(0, 0.5, (batch_size, 3)).astype(np.float32)
    return pose, betas, trans
