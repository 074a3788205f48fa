"""TPU timings for every public fit entry point / weighting configuration.

The lane-major kernel pipeline now covers EVERY fit configuration: plain
``fit``, static- AND per-call-weighted fits (runtime-ω part sums + the
weighted-Gramian kernel), warm starts, ``share_beta`` (any batch size, via
zero-masked padding), scale columns (including weighted+scale),
``fit_with_known_pose`` and ``fit_with_known_shape``. This measures each
configuration plus the streamed XLA solve (``use_kernels=False``) as the
explicit fallback price (cf. STATUS.md secondary metrics).

Usage: python benchmark/bench_fallback_paths.py [--batch 4096] [--reps 6]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def measure(jax, fn, inputs, reps):
    """Pipelined ms/batch over distinct inputs (memoizing-runtime safe)."""
    jax.block_until_ready(fn(*inputs[0]))
    t0 = time.perf_counter()
    outs = [fn(*i) for i in inputs]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1e3


def try_measure(results, name, jax, fn, inputs, reps):
    try:
        results[name] = measure(jax, fn, inputs, reps)
        print(f'# {name}: {results[name]:.1f} ms/batch', flush=True)
    except Exception as e:
        results[name] = None
        msg = str(e).split('\n')[0][:200]
        print(f'# {name}: FAILED ({type(e).__name__}: {msg})', flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=4096)
    parser.add_argument('--reps', type=int, default=6)
    args = parser.parse_args()

    import jax

    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import smplfitter_tpu
    from smplfitter_tpu.utils import synthetic

    B, reps = args.batch, args.reps
    models_dir = synthetic.ensure_cached_models()
    bm = smplfitter_tpu.BodyModel('smpl', 'neutral', model_root=models_dir + '/smpl')
    fitter = smplfitter_tpu.BodyFitter(bm)
    V = bm.num_vertices

    rng = np.random.default_rng(0)
    fwd = jax.jit(lambda p, b, t: bm(pose_rotvecs=p, shape_betas=b, trans=t))
    targets = []
    for _ in range(reps):
        pose = rng.normal(0, 0.3, (B, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (B, 10)).astype(np.float32)
        trans = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
        res = fwd(pose, betas, trans)
        # Everything an entry point consumes must be device-resident BEFORE
        # the timed loop: a numpy argument costs a host->device transfer per
        # dispatch (~30 ms through the remote tunnel), swamping small programs.
        targets.append(
            (res['vertices'], res['joints'], jax.device_put(pose),
             jax.device_put(betas), jax.device_put(trans))
        )
    jax.block_until_ready(targets)

    common = dict(num_iter=3, beta_regularizer=1.0, final_adjust_rots=True)
    results = {}

    # 1. Per-call weighted fit — the kernel path (runtime-ω part sums +
    # weighted-Gramian solve). HandReplacer-like weighting (hands at 0.1).
    vweights = np.ones((B, V), np.float32)
    vweights[:, : V // 8] = 0.1
    jweights = np.ones((B, bm.num_joints), np.float32)
    vweights = jax.device_put(vweights)
    jweights = jax.device_put(jweights)
    fit_w = jax.jit(
        lambda tv, tj, vw, jw: fitter.fit(
            tv, tj, vertex_weights=vw, joint_weights=jw,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'), **common,
        )
    )
    try_measure(results, f'weighted_fit_b{B}', jax, fit_w,
                [(tv, tj, vweights, jweights) for tv, tj, *_ in targets], reps)

    # 1a. The streamed XLA fallback for the same weighted configuration
    # (what gradient traces use, per autodiff_policy). At b4096 the chunked
    # normal equations fit in HBM but cost ~14x the kernels.
    fit_w_xla = jax.jit(
        lambda tv, tj, vw, jw: fitter.fit(
            tv, tj, vertex_weights=vw, joint_weights=jw, use_kernels=False,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'), **common,
        )
    )
    try_measure(results, f'weighted_fit_streamed_b{B}', jax, fit_w_xla,
                [(tv, tj, vweights, jweights) for tv, tj, *_ in targets], reps)

    # 1b. STATIC-weighted fit: the same HandReplacer weighting baked into the
    # fitter at construction — keeps the fused-kernel fast path (cf. the
    # per-call streamed solve in 1.).
    vw_static = np.ones(V, np.float32)
    vw_static[: V // 8] = 0.1
    fitter_w = smplfitter_tpu.BodyFitter(bm, vertex_weights=vw_static,
                                         joint_weights=np.ones(bm.num_joints, np.float32))
    fit_ws = jax.jit(
        lambda tv, tj: fitter_w.fit(
            tv, tj, requested_keys=('pose_rotvecs', 'shape_betas', 'trans'), **common,
        )
    )
    try_measure(results, f'static_weighted_fit_b{B}', jax, fit_ws,
                [(tv, tj) for tv, tj, *_ in targets], reps)

    # 2. fit_with_known_pose (solves shape/trans only).
    fit_kp = jax.jit(
        lambda tv, tj, p: fitter.fit_with_known_pose(
            p, tv, target_joints=tj, beta_regularizer=1.0,
        )
    )
    try_measure(results, 'fit_with_known_pose', jax, fit_kp,
                [(tv, tj, p) for tv, tj, p, *_ in targets], reps)

    # 3. fit_with_known_shape (solves rotations/trans only).
    fit_ks = jax.jit(
        lambda tv, tj, b: fitter.fit_with_known_shape(
            b, tv, target_joints=tj,
        )
    )
    try_measure(results, 'fit_with_known_shape', jax, fit_ks,
                [(tv, tj, b) for tv, tj, _, b, _ in targets], reps)

    # 4. share_beta at full batch (the cross-chip-collective configuration).
    fit_sb = jax.jit(
        lambda tv, tj: fitter.fit(
            tv, tj, share_beta=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'), **common,
        )
    )
    try_measure(results, 'share_beta_fit', jax, fit_sb,
                [(tv, tj) for tv, tj, *_ in targets], reps)

    # 4b. Warm-started fit (the flipper configuration) — kernel path.
    fit_warm = jax.jit(
        lambda tv, tj, p, b: fitter.fit(
            tv, tj, initial_pose_rotvecs=p, initial_shape_betas=b,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'), **common,
        )
    )
    try_measure(results, 'warm_start_fit', jax, fit_warm,
                [(tv, tj, p, b) for tv, tj, p, b, _ in targets], reps)

    # 5. Scale columns on the kernel path: plain scale_target and the
    # (formerly streamed) weighted+scale configuration — both ride the
    # lane-major driver now (scale column in fit_shape_gram_lm /
    # appended in-kernel by wgram_moments).
    fit_st = jax.jit(
        lambda tv, tj: fitter.fit(
            tv, tj, scale_target=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'scale_corr'), **common,
        )
    )
    try_measure(results, 'scale_target_fit', jax, fit_st,
                [(tv, tj) for tv, tj, *_ in targets], reps)

    fit_wsf = jax.jit(
        lambda tv, tj, vw, jw: fitter.fit(
            tv, tj, vertex_weights=vw, joint_weights=jw, scale_fit=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'scale_corr'), **common,
        )
    )
    try_measure(results, f'weighted_scale_fit_b{B}', jax, fit_wsf,
                [(tv, tj, vweights, jweights) for tv, tj, *_ in targets], reps)

    # 6. Plain kernel-path fit for scale (the headline config).
    fit_k = jax.jit(
        lambda tv, tj: fitter.fit(
            tv, tj, requested_keys=('pose_rotvecs', 'shape_betas', 'trans'), **common,
        )
    )
    try_measure(results, 'plain_fit_kernel_path', jax, fit_k,
                [(tv, tj) for tv, tj, *_ in targets], reps)

    print(f'\n== fallback-path timings, batch {B}, {jax.devices()[0].device_kind} ==')
    for name, ms in results.items():
        if ms is None:
            print(f'{name:28s}     FAILED (see above)')
            continue
        b = int(name.rsplit('_b', 1)[1]) if '_b' in name and name.rsplit('_b', 1)[1].isdigit() else B
        print(f'{name:28s} {ms:8.1f} ms/batch   {b / ms * 1e3:12,.0f} fits/s')


if __name__ == '__main__':
    main()
