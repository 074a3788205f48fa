"""Profile the batch-4096 fit on the attached device and print an op-time
breakdown grouped by HLO base name, attributing hot ops to source lines.

This drove the round-1 optimization ladder (see STATUS.md): the trace is
parsed directly from ``jax.profiler.trace``'s ``*.trace.json.gz`` output
because the TensorBoard plugin is unavailable in this environment.

Usage: python benchmark/profile_fit.py [--model smplx] [--weighted]
                                       [--batch 4096] [trace_dir]
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


def run_and_trace(trace_dir: str, model: str = 'smpl', batch: int = 4096,
                  weighted: bool = False) -> None:
    import jax

    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import smplfitter_tpu
    from smplfitter_tpu.utils import synthetic

    models_dir = synthetic.ensure_cached_models()
    model_root = os.path.join(models_dir, model)
    if not os.path.isdir(model_root):
        real_v = dict(mano=778, smplx=10475, smplh16=6890)[model]
        n_betas = dict(mano=10, smplx=16, smplh16=16)[model]
        synthetic.write_model_files(
            models_dir, model, num_vertices=real_v, num_betas=n_betas
        )
    bm = smplfitter_tpu.BodyModel(model, 'neutral', model_root=model_root)
    fitter = smplfitter_tpu.BodyFitter(bm)
    B = batch
    rng = np.random.default_rng(0)
    fwd = jax.jit(lambda p, b, t: bm(pose_rotvecs=p, shape_betas=b, trans=t))
    ins = []
    for _ in range(3):
        res = fwd(
            rng.normal(0, 0.3, (B, bm.num_joints * 3)).astype(np.float32),
            rng.normal(0, 1, (B, bm.num_betas)).astype(np.float32),
            rng.normal(0, 0.5, (B, 3)).astype(np.float32),
        )
        ins.append((res['vertices'], res['joints']))
    jax.block_until_ready(ins)
    kw = dict(
        num_iter=3, beta_regularizer=1.0, final_adjust_rots=True,
        requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
    )
    if weighted:
        vw = jax.numpy.asarray(
            (0.2 + rng.random((B, bm.num_vertices))).astype(np.float32))
        jw = jax.numpy.asarray(
            (0.2 + rng.random((B, bm.num_joints))).astype(np.float32))
        fn = lambda tv, tj: fitter.fit(  # noqa: E731
            tv, tj, vertex_weights=vw, joint_weights=jw, **kw)
    else:
        fn = lambda tv, tj: fitter.fit(tv, tj, **kw)  # noqa: E731
    wrapped, consts = smplfitter_tpu.hoist_constants(fn, *ins[0])
    jf = jax.jit(wrapped)
    fit = lambda tv, tj: jf(consts, tv, tj)  # noqa: E731
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
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument('trace_dir', nargs='?', default='/tmp/fitprof')
    p.add_argument('--model', default='smpl')
    p.add_argument('--batch', type=int, default=int(os.getenv('BENCH_BATCH', '4096')))
    p.add_argument('--weighted', action='store_true')
    a = p.parse_args()
    run_and_trace(a.trace_dir, model=a.model, batch=a.batch, weighted=a.weighted)
    report(a.trace_dir)
