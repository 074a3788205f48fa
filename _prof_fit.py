import glob, gzip, json, os, collections
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import smplfitter_tpu
from smplfitter_tpu.utils import synthetic

models_dir = synthetic.ensure_cached_models()
bm = smplfitter_tpu.BodyModel('smpl', 'neutral', model_root=models_dir + '/smpl')
fitter = smplfitter_tpu.BodyFitter(bm)
B = 4096
rng = np.random.default_rng(0)
fwd = jax.jit(lambda p, b, t: bm(pose_rotvecs=p, shape_betas=b, trans=t))
ins = []
for _ in range(3):
    res = fwd(rng.normal(0,0.3,(B,72)).astype(np.float32),
              rng.normal(0,1,(B,10)).astype(np.float32),
              rng.normal(0,0.5,(B,3)).astype(np.float32))
    ins.append((res['vertices'], res['joints']))
jax.block_until_ready(ins)
fit = jax.jit(lambda tv, tj: fitter.fit(tv, tj, num_iter=3, beta_regularizer=1.0,
    final_adjust_rots=True, requested_keys=('pose_rotvecs','shape_betas','trans')))
jax.block_until_ready(fit(*ins[0]))
with jax.profiler.trace('/tmp/fitprof'):
    jax.block_until_ready(fit(*ins[1]))
    jax.block_until_ready(fit(*ins[2]))
f = sorted(glob.glob('/tmp/fitprof/**/*.trace.json.gz', recursive=True), key=os.path.getmtime)[-1]
ev = json.load(gzip.open(f))['traceEvents']
dur = collections.Counter()
for e in ev:
    if e.get('ph') == 'X' and e.get('dur') and 'args' in e:
        # device-side complete events: pid names contain TPU; filter by tid naming
        dur[e['name']] += e['dur']
tot = sum(v for k, v in dur.items())
for name, d in dur.most_common(28):
    print(f'{d/2/1000:9.3f} ms  {name[:110]}')
