"""Benchmark harness: throughput sweeps stored in SQLite.

Functional analogue of the reference harness
(/root/reference/benchmark/run_benchmark.py): sweeps forward/fit configurations
over batch sizes, measures throughput with proper device synchronization, and
stores rows in ``results.db``. Adapted to the remote-TPU environment: every
repetition uses distinct device-resident inputs (the runtime memoizes repeated
identical executions) and throughput is measured pipelined.

Usage:
  python benchmark/run_benchmark.py --suite forward fit --batch-sizes 32 1024 4096
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sqlite3
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def init_db(path: str):
    conn = sqlite3.connect(path)
    conn.execute(
        'CREATE TABLE IF NOT EXISTS results ('
        ' ts REAL, suite TEXT, config TEXT, batch_size INTEGER,'
        ' items_per_sec REAL, ms_per_batch REAL, device TEXT)'
    )
    return conn


def record(conn, suite, config, batch_size, items_per_sec, ms_per_batch, device):
    conn.execute(
        'INSERT INTO results VALUES (?,?,?,?,?,?,?)',
        (time.time(), suite, json.dumps(config), batch_size, items_per_sec,
         ms_per_batch, device),
    )
    conn.commit()


def measure_pipelined(fn, argsets, reps_inner: int = 1):
    """Pipelined throughput over distinct argsets; returns seconds per call."""
    import jax

    jax.block_until_ready(fn(*argsets[0]))  # compile
    t0 = time.perf_counter()
    outs = [fn(*args) for args in argsets for _ in range(reps_inner)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / (len(argsets) * reps_inner)


def make_inputs(bm, batch, n_sets, rng, pose_std=0.3):
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(
        lambda p, b: bm(pose_rotvecs=p, shape_betas=b)
    )
    sets = []
    for _ in range(n_sets):
        pose = rng.normal(0, pose_std, (batch, bm.num_joints * 3)).astype(np.float32)
        betas = rng.normal(0, 1, (batch, bm.num_betas)).astype(np.float32)
        res = fwd(jnp.asarray(pose), jnp.asarray(betas))
        sets.append((pose, betas, res))
    jax.block_until_ready([s[2] for s in sets])
    return sets


def bench_forward(conn, bm, batch_sizes, n_sets, device, model='smpl'):
    import jax
    import jax.numpy as jnp

    for return_vertices in (True, False):
        fwd = jax.jit(
            lambda p, b: bm(pose_rotvecs=p, shape_betas=b,
                            return_vertices=return_vertices)
        )
        for batch in batch_sizes:
            rng = np.random.default_rng(batch)
            sets = make_inputs(bm, batch, n_sets, rng)
            argsets = [(jnp.asarray(p), jnp.asarray(b)) for p, b, _ in sets]
            sec = measure_pipelined(fwd, argsets)
            cfg = dict(return_vertices=return_vertices, model=model)
            record(conn, 'forward', cfg, batch, batch / sec, sec * 1e3, device)
            print(f'forward vertices={return_vertices} b={batch}: '
                  f'{batch / sec:,.0f}/s ({sec * 1e3:.2f} ms)')


def bench_fit(conn, bm, fitter, batch_sizes, n_sets, device, methods,
              model='smpl'):
    import jax

    for method in methods:
        for batch in batch_sizes:
            rng = np.random.default_rng(batch)
            sets = make_inputs(bm, batch, n_sets, rng)
            if method == 'fit':
                f = jax.jit(
                    lambda tv, tj: fitter.fit(
                        tv, tj, num_iter=3, beta_regularizer=1.0,
                        final_adjust_rots=True,
                        requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
                    )
                )
                argsets = [(r['vertices'], r['joints']) for _, _, r in sets]
            elif method == 'fit_known_shape':
                f = jax.jit(
                    lambda betas, tv, tj: fitter.fit_with_known_shape(
                        betas, tv, tj, num_iter=3,
                        requested_keys=('pose_rotvecs',),
                    )
                )
                argsets = [
                    (jax.numpy.asarray(b), r['vertices'], r['joints'])
                    for _, b, r in sets
                ]
            elif method == 'fit_known_pose':
                f = jax.jit(
                    lambda pose, tv, tj: fitter.fit_with_known_pose(
                        pose, tv, tj, beta_regularizer=1.0,
                    )
                )
                argsets = [
                    (jax.numpy.asarray(p), r['vertices'], r['joints'])
                    for p, _, r in sets
                ]
            elif method == 'fit_weighted':
                wrng = np.random.default_rng(batch + 1)
                vw = jax.numpy.asarray(
                    (0.2 + wrng.random((batch, bm.num_vertices))).astype(np.float32)
                )
                jw = jax.numpy.asarray(
                    (0.2 + wrng.random((batch, bm.num_joints))).astype(np.float32)
                )
                f = jax.jit(
                    lambda tv, tj, vw, jw: fitter.fit(
                        tv, tj, vertex_weights=vw, joint_weights=jw,
                        num_iter=3, beta_regularizer=1.0,
                        final_adjust_rots=True,
                        requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
                    )
                )
                argsets = [(r['vertices'], r['joints'], vw, jw) for _, _, r in sets]
            else:
                raise ValueError(method)
            sec = measure_pipelined(f, argsets)
            record(conn, method, dict(model=model), batch, batch / sec,
                   sec * 1e3, device)
            print(f'{method} b={batch}: {batch / sec:,.0f} fits/s ({sec * 1e3:.1f} ms)')


def bench_latency(conn, bm, fitter, batch_sizes, n_sets, device,
                  model='smpl'):
    """Single-call LATENCY (block every dispatch) — the small-batch regime.

    Unlike the pipelined throughput numbers, this includes the full
    dispatch+sync round trip per call (this environment's remote tunnel has a
    ~25 ms dispatch floor; on a locally attached TPU the floor is the XLA
    dispatch overhead, ~100 µs). Reported as the median over ``n_sets``
    distinct-input calls. Buffers are donated where the entry point allows.
    """
    import jax

    for batch in batch_sizes:
        rng = np.random.default_rng(batch)
        sets = make_inputs(bm, batch, max(n_sets, 8), rng)
        f = jax.jit(
            lambda tv, tj: fitter.fit(
                tv, tj, num_iter=3, beta_regularizer=1.0,
                final_adjust_rots=True,
                requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
            ),
            donate_argnums=(0, 1),
        )
        argsets = [(r['vertices'], r['joints']) for _, _, r in sets]
        jax.block_until_ready(f(*argsets[0]))  # compile (consumes set 0)
        times = []
        for args in argsets[1:]:
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        record(conn, 'fit_latency', dict(mode='blocking', model=model), batch,
               batch / med, med * 1e3, device)
        print(f'fit_latency b={batch}: median {med * 1e3:.2f} ms/call '
              f'({batch / med:,.0f} fits/s serialized)')


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('--suite', nargs='*', default=['forward', 'fit'],
                        choices=['forward', 'fit', 'latency'])
    parser.add_argument('--batch-sizes', nargs='*', type=int,
                        default=[32, 256, 1024, 4096])
    parser.add_argument('--fit-methods', nargs='*',
                        default=['fit', 'fit_known_shape', 'fit_known_pose', 'fit_weighted'])
    parser.add_argument('--model', default='smpl')
    parser.add_argument('--model-root', default=None)
    parser.add_argument('--synthetic', action='store_true',
                        help='benchmark on cached synthetic model files')
    parser.add_argument('--db', default=os.path.join(os.path.dirname(__file__),
                                                     'results.db'))
    parser.add_argument('--n-sets', type=int, default=6)
    args = parser.parse_args(argv)

    import jax

    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_compilation_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import smplfitter_tpu

    model_root = args.model_root
    if args.synthetic and model_root is None:
        from smplfitter_tpu.utils import synthetic

        cache = synthetic.ensure_cached_models()
        model_root = os.path.join(cache, args.model)
        if not os.path.isdir(model_root):
            # Real tensor shapes for the non-default model families so FLOP
            # counts match the licensed models: MANO V=778/J=16,
            # SMPL-X V=10475/J=55, SMPL+H V=6890/J=52.
            real_v = dict(mano=778, smplx=10475, smplh16=6890)[args.model]
            n_betas = dict(mano=10, smplx=16, smplh16=16)[args.model]
            synthetic.write_model_files(
                cache, args.model, num_vertices=real_v, num_betas=n_betas
            )

    bm = smplfitter_tpu.BodyModel(args.model, 'neutral', model_root)
    fitter = smplfitter_tpu.BodyFitter(bm)
    device = jax.devices()[0].device_kind

    conn = init_db(args.db)
    if 'forward' in args.suite:
        bench_forward(conn, bm, args.batch_sizes, args.n_sets, device,
                      model=args.model)
    if 'fit' in args.suite:
        bench_fit(conn, bm, fitter, args.batch_sizes, args.n_sets, device,
                  args.fit_methods, model=args.model)
    if 'latency' in args.suite:
        bench_latency(conn, bm, fitter, args.batch_sizes, args.n_sets,
                      device, model=args.model)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
