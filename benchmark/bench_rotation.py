"""Micro-benchmark of the rotation numerics (analogue of the reference's
benchmark/bench_rotvec.py): rotvec<->matrix conversions and the SO(3)
projection, timed pipelined on the attached device.

Usage: python benchmark/bench_rotation.py [--n 1000000] [--cpu]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n', type=int, default=1_000_000)
    parser.add_argument('--reps', type=int, default=8)
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')

    from smplfitter_tpu.ops import rotation as R

    rng = np.random.default_rng(0)
    N = args.n
    rotvec_sets = [
        rng.normal(0, 1.0, (N, 3)).astype(np.float32) for _ in range(args.reps)
    ]
    mat_sets = [np.asarray(jax.jit(R.rotvec2mat)(v)) for v in rotvec_sets]
    noisy_sets = [m + rng.normal(0, 0.1, m.shape).astype(np.float32) for m in mat_sets]

    def timed(name, fn, inputs):
        jitted = jax.jit(fn)
        jax.block_until_ready(jitted(inputs[0]))
        t0 = time.perf_counter()
        outs = [jitted(x) for x in inputs]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / len(inputs)
        print(f'{name:24s} {N / dt / 1e6:10.1f} M/s   ({dt * 1e3:.2f} ms per {N:,})')

    print(f'# device: {jax.devices()[0].device_kind}')
    timed('rotvec2mat', R.rotvec2mat, rotvec_sets)
    timed('mat2rotvec', R.mat2rotvec, mat_sets)
    timed('proj_SO3 (scalarized)', R.proj_SO3, noisy_sets)
    timed('rot6d_to_rotmat', R.rot6d_to_rotmat,
          [rng.normal(0, 1, (N, 6)).astype(np.float32) for _ in range(args.reps)])


if __name__ == '__main__':
    main()
