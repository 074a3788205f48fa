"""Per-iteration accuracy/runtime study of BodyConverter (SMPL -> SMPL-X).

Replicates the protocol of the reference's conversion study
(/root/reference/docs/smpl_to_smplx.rst:14-55): convert a batch of SMPL bodies
to SMPL-X parameters, reconstruct SMPL-X vertices, and measure the mean
per-vertex distance to the barycentric vertex-transfer of the SMPL mesh (the
fitting target) for num_iter = 1, 2, 3.

Runs on whatever backend is active: CPU gives the accuracy table (model-file
independent — synthetic files by default, real ones via
SMPLFITTER_BODY_MODELS); an attached TPU also gives meaningful timings.

Usage: python benchmark/convert_accuracy_study.py [--batch 33] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=33)
    parser.add_argument('--cpu', action='store_true', help='force CPU platform')
    parser.add_argument('--reps', type=int, default=5, help='timing reps (TPU)')
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import smplfitter_tpu
    from smplfitter_tpu.utils import synthetic

    if os.environ.get('SMPLFITTER_BODY_MODELS') is None:
        full_dir = synthetic.ensure_cached_models(full=True)
        link_parent = osp.join(osp.dirname(full_dir), 'full_env_root')
        os.makedirs(link_parent, exist_ok=True)
        link = osp.join(link_parent, 'body_models')
        if not osp.islink(link):
            os.symlink(full_dir, link)
        os.environ['SMPLFITTER_BODY_MODELS'] = full_dir
        os.environ['DATA_ROOT'] = link_parent
        print(f'# synthetic environment at {full_dir} (real shapes V=6890/10475)')

    smpl = smplfitter_tpu.BodyModel('smpl', 'neutral')
    smplx = smplfitter_tpu.BodyModel('smplx', 'neutral')
    conv = smplfitter_tpu.BodyConverter(smpl, smplx)

    B = args.batch
    rng = np.random.default_rng(0)
    pose = rng.normal(0, 0.3, (B, 72)).astype(np.float32)
    betas = rng.normal(0, 1, (B, 10)).astype(np.float32)
    trans = rng.normal(0, 0.5, (B, 3)).astype(np.float32)

    # The fitting target: SMPL vertices pushed through the barycentric
    # vertex-transfer map (what the converter is asked to reproduce).
    fwd_in = jax.jit(lambda p, b, t: smpl(pose_rotvecs=p, shape_betas=b, trans=t))
    smpl_verts = fwd_in(pose, betas, trans)['vertices']
    target_x_verts = np.asarray(jax.jit(conv.convert_vertices)(smpl_verts))

    fwd_out = jax.jit(lambda p, b, t: smplx(pose_rotvecs=p, shape_betas=b, trans=t))

    print(f'# batch {B}, device {jax.devices()[0].device_kind}')
    print(f'{"num_iter":>8} {"mean v2v (mm)":>14} {"ms/batch":>10}')
    for num_iter in (1, 2, 3):
        convert = jax.jit(
            lambda p, b, t, n=num_iter: conv.convert(p, b, t, num_iter=n)
        )
        out = jax.block_until_ready(convert(pose, betas, trans))
        rec = np.asarray(
            fwd_out(out['pose_rotvecs'], out['shape_betas'], out['trans'])['vertices']
        )
        v2v = float(np.mean(np.linalg.norm(rec - target_x_verts, axis=-1))) * 1e3

        # Pipelined timing over distinct inputs (memoizing-runtime safe).
        ins = []
        for r in range(args.reps):
            ins.append((
                pose + np.float32(1e-4 * (r + 1)), betas, trans,
            ))
        t0 = time.perf_counter()
        outs = [convert(*i) for i in ins]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f'{num_iter:>8} {v2v:>14.2f} {ms:>10.1f}')


if __name__ == '__main__':
    main()
