"""Headline benchmark: BodyFitter.fit throughput at batch 4096 (SMPL shapes).

Matches the reference's headline configuration (README.md:15 there): SMPL,
full 6890 vertices, num_iter=3, final rotation adjustment on, batch 4096 —
9,481 fits/s on an RTX 3090. Synthetic model weights at real tensor shapes
(licensed files are not redistributable; FLOP counts are identical).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is vs the reference's 9,481 fits/s. Also reports the round-trip
v2v error as a fit-quality guard (must stay in the few-mm regime).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FITS_PER_SEC = 9481.0  # reference PT backend, RTX 3090, README.md:15
BATCH = int(os.getenv('BENCH_BATCH', '4096'))
NUM_ITER = 3
WARMUP = 2
REPS = int(os.getenv('BENCH_REPS', '5'))


def main() -> None:
    import jax

    # Persistent compilation cache: repeated bench runs skip XLA recompiles.
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import smplfitter_tpu
    from smplfitter_tpu.utils import synthetic

    models_dir = synthetic.ensure_cached_models()
    bm = smplfitter_tpu.BodyModel('smpl', 'neutral', model_root=models_dir + '/smpl')
    fitter = smplfitter_tpu.BodyFitter(bm)

    rng = np.random.default_rng(0)
    pose = rng.normal(0, 0.3, (BATCH, 72)).astype(np.float32)
    betas = rng.normal(0, 1, (BATCH, 10)).astype(np.float32)
    trans = rng.normal(0, 0.5, (BATCH, 3)).astype(np.float32)

    fwd = jax.jit(lambda p, b, t: bm(pose_rotvecs=p, shape_betas=b, trans=t))
    res = jax.block_until_ready(fwd(pose, betas, trans))
    target_vertices = res['vertices']
    target_joints = res['joints']

    fit_fn = jax.jit(
        lambda tv, tj: fitter.fit(
            tv,
            tj,
            num_iter=NUM_ITER,
            beta_regularizer=1.0,
            final_adjust_rots=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
    )

    # Warmup (includes compile).
    t0 = time.perf_counter()
    out = jax.block_until_ready(fit_fn(target_vertices, target_joints))
    compile_s = time.perf_counter() - t0
    for _ in range(WARMUP - 1):
        out = jax.block_until_ready(fit_fn(target_vertices, target_joints))

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fit_fn(target_vertices, target_joints))
        times.append(time.perf_counter() - t0)
    best = min(times)
    fits_per_sec = BATCH / best

    # Fit-quality guard: reconstruct from fitted params and measure v2v.
    refit = jax.block_until_ready(
        fwd(out['pose_rotvecs'], out['shape_betas'], out['trans'])
    )
    v2v = float(
        np.mean(
            np.linalg.norm(
                np.asarray(refit['vertices']) - np.asarray(target_vertices), axis=-1
            )
        )
    )

    print(
        json.dumps(
            dict(
                metric=f'fit_throughput_smpl_b{BATCH}_iter{NUM_ITER}',
                value=round(fits_per_sec, 1),
                unit='fits/s',
                vs_baseline=round(fits_per_sec / BASELINE_FITS_PER_SEC, 3),
            )
        )
    )
    print(
        f'# batch={BATCH} best={best * 1e3:.1f}ms mean={np.mean(times) * 1e3:.1f}ms '
        f'compile={compile_s:.0f}s v2v_roundtrip={v2v * 1e3:.2f}mm '
        f'device={jax.devices()[0].device_kind}',
        file=sys.stderr,
    )


if __name__ == '__main__':
    main()
