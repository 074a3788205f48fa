"""Warm the persistent XLA compilation cache over representative fit shapes.

Usage: ``python -m smplfitter_tpu.precompile [--batch-sizes 32 1024 4096 ...]``

First compilation of the fit graph is slow (tens of seconds; minutes over a
remote-TPU tunnel). This CLI ahead-of-time compiles the common configurations
into JAX's persistent compilation cache so production processes start hot —
the TPU analogue of the reference's Numba JIT warmup CLI
(/root/reference/src/smplfitter/nb/precompile.py:11-107), except the artifact
is a serialized XLA executable instead of a Numba cache.
"""

from __future__ import annotations

import argparse
import os
import time

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser('~'), '.cache', 'jax_compilation_cache'
)


def warm(
    model_name: str = 'smpl',
    gender: str = 'neutral',
    model_root: str | None = None,
    batch_sizes=(32, 1024, 4096),
    num_iter: int = 3,
    num_betas: int = 10,
    with_joints: bool = True,
    cache_dir: str = DEFAULT_CACHE_DIR,
    synthetic_fallback: bool = False,
    grad_chunk: int | None = 0,
    check_parity: bool = False,
) -> None:
    import jax

    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import numpy as np

    import smplfitter_tpu

    if synthetic_fallback and model_root is None:
        from smplfitter_tpu.utils import synthetic

        model_root = os.path.join(synthetic.ensure_cached_models(), model_name)

    bm = smplfitter_tpu.BodyModel(model_name, gender, model_root, num_betas=num_betas)
    fitter = smplfitter_tpu.BodyFitter(bm)
    fwd = jax.jit(lambda p, b: bm(pose_rotvecs=p, shape_betas=b))
    fit = jax.jit(
        lambda tv, tj: fitter.fit(
            tv, tj, num_iter=num_iter, final_adjust_rots=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
    )
    fit_nj = jax.jit(
        lambda tv: fitter.fit(
            tv, num_iter=num_iter, final_adjust_rots=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
    )

    rng = np.random.default_rng(0)
    for batch in batch_sizes:
        pose = rng.normal(0, 0.2, (batch, bm.num_joints * 3)).astype(np.float32)
        betas = rng.normal(0, 1, (batch, num_betas)).astype(np.float32)
        t0 = time.perf_counter()
        res = jax.block_until_ready(fwd(pose, betas))
        jax.block_until_ready(fit(res['vertices'], res['joints']))
        if not with_joints:
            jax.block_until_ready(fit_nj(res['vertices']))
        print(f'  batch {batch}: compiled in {time.perf_counter() - t0:.1f}s')

    if grad_chunk != 0:
        # Warm the grad-of-fit executable into the persistent cache: the
        # value+grad program compiles in ~1.5-2 minutes cold (see
        # docs/howto.md "Differentiate through the fit") — pay it once per
        # cache directory, not once per production process. grad_chunk=None
        # warms the (faster, default) monolithic program; an integer warms
        # the lax.scan-chunked one.
        from .api import get_fit_grad_fn

        vg = get_fit_grad_fn(fitter, chunk=grad_chunk, num_iter=num_iter)
        for batch in batch_sizes:
            if grad_chunk and (batch < grad_chunk or batch % grad_chunk):
                continue
            pose = rng.normal(0, 0.2, (batch, bm.num_joints * 3)).astype(np.float32)
            betas = rng.normal(0, 1, (batch, num_betas)).astype(np.float32)
            res = jax.block_until_ready(fwd(pose, betas))
            t0 = time.perf_counter()
            jax.block_until_ready(vg(res['vertices'], res['joints']))
            print(f'  grad batch {batch} (chunk {grad_chunk}): compiled in '
                  f'{time.perf_counter() - t0:.1f}s')


    if check_parity:
        rep = fitter.check_kernel_parity(num_iter=num_iter)
        print(f'  kernel parity: ok={rep["ok"]} '
              f'max|dbetas|={rep["max_dbetas"]:.2e} '
              f'v2v kernel={rep["v2v_kernel_mm"]:.4f}mm '
              f'xla={rep["v2v_xla_mm"]:.4f}mm')


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    parser.add_argument('--model', default='smpl')
    parser.add_argument('--gender', default='neutral')
    parser.add_argument('--model-root', default=None)
    parser.add_argument('--batch-sizes', nargs='*', type=int, default=[32, 1024, 4096])
    parser.add_argument('--num-iter', type=int, default=3)
    parser.add_argument('--num-betas', type=int, default=10)
    parser.add_argument('--cache-dir', default=DEFAULT_CACHE_DIR)
    parser.add_argument('--synthetic', action='store_true',
                        help='use synthetic model files (benchmarking without '
                             'licensed data)')
    parser.add_argument('--grad', type=int, nargs='?', const=-1, default=0,
                        metavar='CHUNK',
                        help='also warm the grad-of-fit executable. Bare '
                             '--grad warms the monolithic (default, fastest) '
                             'program; --grad N warms the lax.scan-chunked '
                             'one at batch chunk N (the memory-bounded '
                             'recipe)')
    parser.add_argument('--check-parity', action='store_true',
                        help='run BodyFitter.check_kernel_parity() after '
                             'warming: one batch, fused-kernel path vs the '
                             'pure-XLA formulation (guards the 5-term blend '
                             'packing on YOUR model; exits nonzero on failure)')
    args = parser.parse_args(argv)
    warm(
        args.model,
        args.gender,
        args.model_root,
        tuple(args.batch_sizes),
        args.num_iter,
        args.num_betas,
        cache_dir=args.cache_dir,
        synthetic_fallback=args.synthetic,
        grad_chunk=None if args.grad == -1 else args.grad,
        check_parity=args.check_parity,
    )
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
