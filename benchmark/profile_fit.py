"""Profile the batch-4096 fit on the attached device and print an op-time
breakdown grouped by HLO base name, attributing hot ops to source lines.

This drove the round-1 optimization ladder (see STATUS.md): the trace is
parsed directly from ``jax.profiler.trace``'s ``*.trace.json.gz`` output
because the TensorBoard plugin is unavailable in this environment.

Usage: python benchmark/profile_fit.py [trace_dir]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import numpy as np


def run_and_trace(trace_dir: str) -> None:
    import jax

    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import smplfitter_tpu
    from smplfitter_tpu.utils import synthetic

    models_dir = synthetic.ensure_cached_models()
    bm = smplfitter_tpu.BodyModel('smpl', 'neutral', model_root=models_dir + '/smpl')
    fitter = smplfitter_tpu.BodyFitter(bm)
    B = int(os.getenv('BENCH_BATCH', '4096'))
    rng = np.random.default_rng(0)
    fwd = jax.jit(lambda p, b, t: bm(pose_rotvecs=p, shape_betas=b, trans=t))
    ins = []
    for _ in range(3):
        res = fwd(
            rng.normal(0, 0.3, (B, 72)).astype(np.float32),
            rng.normal(0, 1, (B, 10)).astype(np.float32),
            rng.normal(0, 0.5, (B, 3)).astype(np.float32),
        )
        ins.append((res['vertices'], res['joints']))
    jax.block_until_ready(ins)
    fit = jax.jit(
        lambda tv, tj: fitter.fit(
            tv, tj, num_iter=3, beta_regularizer=1.0, final_adjust_rots=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
    )
    jax.block_until_ready(fit(*ins[0]))
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(fit(*ins[1]))
        jax.block_until_ready(fit(*ins[2]))


def report(trace_dir: str, n_execs: int = 2) -> None:
    f = sorted(
        glob.glob(f'{trace_dir}/**/*.trace.json.gz', recursive=True),
        key=os.path.getmtime,
    )[-1]
    ev = json.load(gzip.open(f))['traceEvents']
    cat: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    src: collections.Counter = collections.Counter()
    for e in ev:
        if e.get('ph') == 'X' and e.get('dur') and 'args' in e:
            n = e['name']
            if n.startswith('jit_'):
                continue
            base = re.sub(r'[.\d]+$', '', n)
            cat[base] += e['dur']
            cnt[base] += 1
            where = e['args'].get('source', '')
            if where:
                src[(base, where)] += e['dur']
    tot = sum(cat.values())
    print(f'device total: {tot / 1000 / n_execs:.1f} ms/fit')
    for name, d in cat.most_common(20):
        print(f'{d / 1000 / n_execs:8.3f} ms  x{cnt[name] // n_execs:<4d} {name[:70]}')
    print('\ntop source attributions:')
    for (base, where), d in src.most_common(12):
        rel = where.replace('/root/repo/', '')
        print(f'{d / 1000 / n_execs:8.3f} ms  {base:28s} {rel}')


if __name__ == '__main__':
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/fitprof'
    run_and_trace(trace_dir)
    report(trace_dir)
