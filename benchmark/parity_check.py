"""End-to-end fit parity check against the reference NumPy oracle on the
attached device. This is the numeric gate for any kernel/precision change:
betas/pose must stay within ~2e-4 of the oracle and the reconstruction v2v
within ~0.001 mm of the oracle's (bench.py's 50-mm-scale v2v guard alone is
too coarse to catch e.g. 2e-2 beta drift).

Usage: python benchmark/parity_check.py
"""

import sys
import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import smplfitter_tpu
from smplfitter_tpu.utils import synthetic

models_dir = synthetic.ensure_cached_models()
bm = smplfitter_tpu.BodyModel('smpl', 'neutral', model_root=models_dir + '/smpl')
fitter = smplfitter_tpu.BodyFitter(bm)
sys.path.insert(0, '/root/reference/src')
import os
os.environ['SMPLFITTER_BODY_MODELS'] = models_dir
import smplfitter.np as ref_np
ref_fit = ref_np.BodyFitter(ref_np.BodyModel('smpl', 'neutral'))

rng = np.random.default_rng(3)
B = 32
pose = rng.normal(0, 0.3, (B, 72)).astype(np.float32)
betas = rng.normal(0, 1, (B, 10)).astype(np.float32)
trans = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
res = bm(pose_rotvecs=pose, shape_betas=betas, trans=trans)
tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])

kw = dict(num_iter=3, beta_regularizer=1.0, final_adjust_rots=True,
          requested_keys=['pose_rotvecs', 'shape_betas', 'trans'])
ours = jax.block_until_ready(fitter.fit(tv, tj, **kw))
ref = ref_fit.fit(target_vertices=tv, target_joints=tj, **kw)
for k in ('shape_betas', 'pose_rotvecs', 'trans'):
    d = float(np.max(np.abs(np.asarray(ours[k]) - ref[k])))
    print(f'TPU-vs-reference max|d {k}| = {d:.2e}')
# Reconstruction error of each solution against the targets (the real metric).
ours_re = np.asarray(bm(pose_rotvecs=np.asarray(ours['pose_rotvecs']),
                        shape_betas=np.asarray(ours['shape_betas']),
                        trans=np.asarray(ours['trans']))['vertices'])
ref_re = np.asarray(bm(pose_rotvecs=ref['pose_rotvecs'].astype(np.float32),
                       shape_betas=ref['shape_betas'].astype(np.float32),
                       trans=ref['trans'].astype(np.float32))['vertices'])
print(f'ours  v2v = {np.mean(np.linalg.norm(ours_re - tv, axis=-1))*1000:.4f} mm')
print(f'ref   v2v = {np.mean(np.linalg.norm(ref_re - tv, axis=-1))*1000:.4f} mm')
