"""TPU cost of differentiating THROUGH the fit (grad w.r.t. target vertices).

The reference flagship backpropagates through the whole fit
(/root/reference/tests/pt/test_fitter_grad.py:1-60; num_iter 1 and 3, no
final adjustment). This measures value+grad of a fit loss on the real TPU at
small and production batch sizes, via the documented recipe:

 - ``smplfitter_tpu.hoist_constants`` turns the ~50 MB of closed-over model
   constants into jit parameters (inlined MLIR constants OOM AOT compilers
   on grad programs; measured 99 MB -> 4 MB of MLIR at batch 32);
 - hoisting records the fit at trace time WITHOUT a JVP tracer, so the
   KERNEL path (fused Pallas forward + custom-VJP backward kernels) is what
   gets differentiated — the backward kernels themselves run on the TPU.
   (A direct ``jax.grad`` without hoisting triggers the Python-level
   autodiff detection and follows ``lbs_kernels.autodiff_policy`` instead.)

Large batches: the monolithic b4096 grad program exceeds this environment's
chipless AOT compiler (subprocess exit 1). Two working recipes, both
measured here:

 - ``--chunk N``: `lax.scan` the fit over batch chunks of size N inside the
   loss. Fits are per-instance independent (no share_beta), so the grad of
   the summed loss decomposes exactly; the compiled program is ONE chunk's
   forward+backward (kernel path, custom-VJP backward kernels) iterated
   B/N times — compile cost is that of the chunk-sized program.
 - ``--xla``: `use_kernels=False` pure-XLA fallback (monolithic batch).

Usage: python benchmark/bench_grad.py [--batches 32,4096] [--reps 4]
                                      [--final-adjust] [--num-iter 3]
                                      [--chunk 512] [--xla]
Writes one JSON line per batch size.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batches', type=str, default='32,4096')
    parser.add_argument('--reps', type=int, default=4)
    parser.add_argument('--num-iter', type=int, default=3)
    parser.add_argument(
        '--final-adjust', action='store_true',
        help='include the final rotation adjustment in the differentiated fit '
             '(the reference grad tests do not; its backward adds the '
             'level-sequential tree walk to the program)',
    )
    parser.add_argument(
        '--chunk', type=int, default=0,
        help='lax.scan the fit over batch chunks of this size inside the '
             'loss (0 = monolithic batch). Makes production-batch grads '
             'compile: the program is one chunk-sized fit fwd+bwd.',
    )
    parser.add_argument(
        '--xla', action='store_true',
        help='use_kernels=False pure-XLA fallback path',
    )
    args = parser.parse_args()

    import jax

    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import smplfitter_tpu
    from smplfitter_tpu.utils import synthetic

    models_dir = synthetic.ensure_cached_models()
    bm = smplfitter_tpu.BodyModel('smpl', 'neutral', model_root=models_dir + '/smpl')
    fitter = smplfitter_tpu.BodyFitter(bm)

    # The canonical production recipe (hoisted constants + lax.scan batch
    # chunking + per-shape caching) lives in smplfitter_tpu.get_fit_grad_fn;
    # this harness only measures it.
    vg = smplfitter_tpu.get_fit_grad_fn(
        fitter, chunk=args.chunk or None, num_iter=args.num_iter,
        beta_regularizer=1.0, final_adjust_rots=args.final_adjust,
        use_kernels=not args.xla,
    )

    rng = np.random.default_rng(0)
    fwd = jax.jit(lambda p, b, t: bm(pose_rotvecs=p, shape_betas=b, trans=t))

    for B in [int(x) for x in args.batches.split(',')]:
        targets = []
        for _ in range(args.reps):
            pose = rng.normal(0, 0.3, (B, 72)).astype(np.float32)
            betas = rng.normal(0, 1, (B, 10)).astype(np.float32)
            trans = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
            res = fwd(pose, betas, trans)
            targets.append((res['vertices'], res['joints']))
        jax.block_until_ready(targets)

        t0 = time.perf_counter()
        out = vg(*targets[0])
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0

        # Pipelined steady state over distinct inputs (memoizing runtime).
        t0 = time.perf_counter()
        outs = [vg(*t) for t in targets]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / args.reps * 1e3

        g0 = np.asarray(outs[0][1][0])
        finite = bool(np.isfinite(g0).all())
        nonzero = bool(np.abs(g0).max() > 0)
        if args.xla:
            path = 'hoisted XLA fallback (use_kernels=False)'
        else:
            path = 'hoisted kernel path (custom-VJP backward kernels)'
        if args.chunk:
            path += f', lax.scan-chunked at {args.chunk}'
        print(json.dumps(dict(
            metric='grad_of_fit', batch=B, num_iter=args.num_iter,
            final_adjust=args.final_adjust,
            compile_s=round(compile_s, 1), ms_per_batch=round(ms, 2),
            fits_per_s=round(B / ms * 1e3),
            grad_finite=finite, grad_nonzero=nonzero,
            path=path,
            device=jax.devices()[0].device_kind,
        )), flush=True)


if __name__ == '__main__':
    main()
