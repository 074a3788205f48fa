"""Time each fused kernel of the fit in isolation at production shapes.

Each case is measured pipelined over distinct inputs (the remote runtime
memoizes identical executions; per-dispatch latency ~25 ms). Shapes are the
SMPL b4096 flagship configuration.

Usage: python benchmark/kernel_breakdown.py [--batch 4096]
"""

from __future__ import annotations

import argparse
import os.path as _osp
import sys as _sys
import time

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

N_CALLS = 32


def timed(name, fn, inputs):
    """fn(one input pytree) -> outputs; inputs: list of distinct pytrees."""
    jax.block_until_ready(fn(inputs[0]))  # compile+warm
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(inputs)
    print(f'{name:34s} {dt * 1e3:8.3f} ms')
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4096)
    p.add_argument('--model', default='smpl')
    args = p.parse_args()
    B = args.batch

    import os

    import smplfitter_tpu
    from smplfitter_tpu.ops import lbs_kernels
    from smplfitter_tpu.utils import synthetic

    models_dir = synthetic.ensure_cached_models()
    model_root = os.path.join(models_dir, args.model)
    if not os.path.isdir(model_root):
        # Real tensor shapes for the non-default families (cf. run_benchmark).
        real_v = dict(mano=778, smplx=10475, smplh16=6890)[args.model]
        n_betas = dict(mano=10, smplx=16, smplh16=16)[args.model]
        synthetic.write_model_files(
            models_dir, args.model, num_vertices=real_v, num_betas=n_betas
        )
    bm = smplfitter_tpu.BodyModel(args.model, 'neutral', model_root=model_root)
    fitter = smplfitter_tpu.BodyFitter(bm)
    gram = fitter.gram
    plan = fitter.plan
    data = bm.data

    rng = np.random.default_rng(0)
    J = data.num_joints
    V = data.num_vertices
    E = gram.n_ext
    F = gram.consts_pose.shape[2]

    def mk_inputs(n, maker):
        return [maker(i) for i in range(n)]

    # Device-resident distinct inputs
    def tgt(i):
        return jnp.asarray(
            rng.normal(0, 0.5, (3, V, B)).astype(np.float32))

    def pj(i):
        return jnp.asarray(rng.normal(0, 1, (12, J, B)).astype(np.float32))

    def feat(i, f=F):
        return jnp.asarray(rng.normal(0, 1, (f, B)).astype(np.float32))

    # Few big target buffers (HBM!), many distinct small operands — the
    # runtime memoizes on the full input tuple, so varying pj/feat alone
    # defeats memoization without 32 copies of the 339 MB targets.
    N_BIG = 6
    tgts = (mk_inputs(N_BIG, tgt) * N_CALLS)[:N_CALLS]
    pjs = mk_inputs(N_CALLS, pj)
    feats = mk_inputs(N_CALLS, feat)
    tgt_bm = [jnp.transpose(t, (2, 1, 0)) for t in tgts[:N_BIG]]
    jax.block_until_ready([tgts[:N_BIG], pjs, feats, tgt_bm])

    print(f'B={B} V={V} J={J} E={E} F={F}')

    # --- transpose ---
    tr = jax.jit(lambda t: lbs_kernels.to_vertex_major(t) * 1.0000001)
    timed('to_vertex_major (+eps mul)', tr, tgt_bm)

    print(f'blend layout: jr={getattr(gram.blend_layout, "jr", None)} '
          f'jp={getattr(gram.blend_layout, "jp", None)}')

    # --- rhs_moments: subset layout vs degenerate full-width ---
    f_rhs = jax.jit(lambda t, p, f: lbs_kernels.rhs_moments(
        t, p, f, gram.weights_pad, gram.consts_pose, gram.sd_cm,
        layout=gram.blend_layout))
    timed('rhs_moments (subset)', lambda x: f_rhs(*x), list(zip(tgts, pjs, feats)))
    f_rhs0 = jax.jit(lambda t, p, f: lbs_kernels.rhs_moments(
        t, p, f, gram.weights_pad, gram.consts_pose, gram.sd_cm, layout=None))
    timed('rhs_moments (full)', lambda x: f_rhs0(*x), list(zip(tgts, pjs, feats)))

    # --- recon_part_sums (consts_full: F + E channels) ---
    featsE = mk_inputs(N_CALLS, lambda i: feat(i, F + E))
    f_rec = jax.jit(lambda t, p, f: lbs_kernels.recon_part_sums_lm(
        t, p, f, gram.weights_pad, gram.consts_full, plan.pm_t_pad,
        layout=gram.blend_layout))
    timed('recon_part_sums_lm (subset)', lambda x: f_rec(*x),
          list(zip(tgts, pjs, featsE)))
    f_rec0 = jax.jit(lambda t, p, f: lbs_kernels.recon_part_sums_lm(
        t, p, f, gram.weights_pad, gram.consts_full, plan.pm_t_pad,
        layout=None))
    timed('recon_part_sums_lm (full)', lambda x: f_rec0(*x),
          list(zip(tgts, pjs, featsE)))

    # --- part_sums_vm ---
    ref_vm = jnp.asarray(rng.normal(0, 0.5, (3, gram.weights_pad.shape[0], 1))
                         .astype(np.float32))
    f_ps = jax.jit(lambda t: lbs_kernels.part_sums_vm_lm(
        t, ref_vm, plan.pm_t_pad))
    timed('part_sums_vm_lm', f_ps, tgts[:N_BIG])

    # --- lbs_points ---
    f_lbs = jax.jit(lambda p, f: lbs_kernels.lbs_points(
        p, f, gram.weights_pad, gram.consts_full))
    timed('lbs_points', lambda x: f_lbs(*x), list(zip(pjs, featsE)))

    # --- gram_assembly ---
    J3 = J * 3
    R_cm = mk_inputs(N_CALLS, lambda i: jnp.asarray(
        rng.normal(size=(3, J3, B)).astype(np.float32)))
    T_cm = mk_inputs(N_CALLS, lambda i: jnp.asarray(
        rng.normal(size=(3, E * J, B)).astype(np.float32)))
    y_cm = mk_inputs(N_CALLS, lambda i: jnp.asarray(
        rng.normal(size=(3, J, B)).astype(np.float32)))
    P_dummy = jnp.zeros((3, 1, B), jnp.float32)
    bJ_dummy = jnp.zeros((3, 1, B), jnp.float32)
    f_gram = jax.jit(lambda R, T, y: lbs_kernels.gram_assembly(
        R, T, y, P_dummy, bJ_dummy, gram.Ksd, gram.Lz_e, gram.sd1_2d,
        jnp.asarray(gram.q), gram.W1_col, has_joints=False))
    timed('gram_assembly', lambda x: f_gram(*x), list(zip(R_cm, T_cm, y_cm)))


if __name__ == '__main__':
    main()
