"""Time each fused kernel of the fit in isolation at production shapes.

Each case is measured pipelined over distinct inputs (the remote runtime
memoizes identical executions; per-dispatch latency ~25 ms). Default shapes
are the SMPL b4096 flagship configuration; ``--model smplx`` measures the
large-F/J regime (cached-homog pipeline). ``--bwd`` adds the backward
(custom-VJP) kernels — the grad-of-fit cost accounting.

The big target buffers are shared across calls (HBM: a b4096 SMPL-X target
is 515 MB); distinct small operands (pj/feat) defeat the runtime's
memoization.

Usage: python benchmark/kernel_breakdown.py [--batch 4096] [--model smplx]
                                            [--bwd]
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

# v5e roofline constants: one MXU at 197 bf16 TFLOP/s, HBM ~819 GB/s.
MXU_TFLOPS = 197e12
HBM_BPS = 819e9


def timed(name, fn, inputs, mxu_flops=None, hbm_bytes=None):
    """fn(one input pytree) -> outputs; inputs: list of distinct pytrees.

    ``mxu_flops``/``hbm_bytes`` are the kernel's algorithmic minima (flops as
    ISSUED by the chosen emulation — unpadded K/M/N, counting each bf16 pass;
    bytes = every HBM operand/output touched once); the printout adds the
    roofline minima and the utilization against the binding one.
    """
    jax.block_until_ready(fn(inputs[0]))  # compile+warm
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(inputs)
    line = f'{name:34s} {dt * 1e3:8.3f} ms'
    if mxu_flops is not None:
        mxu_ms = mxu_flops / MXU_TFLOPS * 1e3
        hbm_ms = (hbm_bytes or 0) / HBM_BPS * 1e3
        floor = max(mxu_ms, hbm_ms)
        bound = 'MXU' if mxu_ms >= hbm_ms else 'HBM'
        line += (f'   min {floor:6.3f} ms ({bound}-bound: mxu {mxu_ms:5.3f} /'
                 f' hbm {hbm_ms:5.3f})  util {floor / (dt * 1e3) * 100:4.0f}%')
    print(line, flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=4096)
    p.add_argument('--model', default='smpl')
    p.add_argument('--bwd', action='store_true',
                   help='also time the backward (custom-VJP) kernels')
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
    # Synthetic models have scattered vertex orders -> degenerate (None)
    # layouts; resolve to the same full-width layout the kernels build.
    layout = gram.blend_layout or lbs_kernels.default_layout(
        gram.weights_pad, lbs_kernels.VC)
    layout_w = gram.blend_layout_w or lbs_kernels.default_layout(
        gram.weights_pad, lbs_kernels.VC_W)

    rng = np.random.default_rng(0)
    J = data.num_joints
    V = data.num_vertices
    V_pad = gram.weights_pad.shape[0]
    E = gram.n_ext
    F = gram.consts_pose.shape[2]
    cached_pipeline = F > lbs_kernels.HOMOG_GEMM_MIN_F

    def mk_inputs(n, maker):
        return [maker(i) for i in range(n)]

    # Device-resident distinct inputs. Big per-vertex buffers are shared
    # across calls (HBM budget!), small per-call operands vary.
    tgt_bytes = 3 * V * B * 4
    n_big = max(2, min(6, int(2.5e9 // tgt_bytes)))

    def tgt(i):
        return jnp.asarray(
            rng.normal(0, 0.5, (3, V, B)).astype(np.float32))

    def pj(i):
        return jnp.asarray(rng.normal(0, 1, (12, J, B)).astype(np.float32))

    def feat(i, f=F):
        return jnp.asarray(rng.normal(0, 1, (f, B)).astype(np.float32))

    tgts = (mk_inputs(n_big, tgt) * N_CALLS)[:N_CALLS]
    pjs = mk_inputs(N_CALLS, pj)
    feats = mk_inputs(N_CALLS, feat)
    jax.block_until_ready([tgts[:n_big], pjs, feats])

    print(f'B={B} V={V} J={J} E={E} F={F} n_big={n_big} '
          f'cached_pipeline={cached_pipeline}')

    # --- transpose --- (derived inputs freed right after; the distinct
    # scalar multiplies BEFORE the transpose — like the fit's fused
    # centering — and defeats the runtime's memoization of repeated
    # executions / recognition of inverse transposes)
    tgt_bm = [jnp.transpose(t, (2, 1, 0)) for t in tgts[:n_big]]
    jax.block_until_ready(tgt_bm)
    tr = jax.jit(lambda t, s: lbs_kernels.to_vertex_major(t * s))
    scalars = [jnp.float32(1.0 + 1e-7 * i) for i in range(N_CALLS)]
    timed('to_vertex_major (+eps mul)', lambda x: tr(*x),
          list(zip((tgt_bm * N_CALLS)[:N_CALLS], scalars)),
          mxu_flops=0, hbm_bytes=2 * tgt_bytes)
    del tgt_bm

    print(f'blend layout: jr={layout.jr} '
          f'jp={layout.jp}')

    # --- posed-template GEMM (the cached-homog producer) ---
    f_pt = jax.jit(lambda f: lbs_kernels.posed_template_lm(f, gram.consts_pose))
    homog_bytes = 3 * V_pad * B * 4
    timed('posed_template_lm', f_pt, feats,
          mxu_flops=9 * V_pad * F * B * 2,
          hbm_bytes=V_pad * 4 * F * 4 + homog_bytes)
    homogs = (
        [f_pt(f) for f in feats[:n_big]] * N_CALLS
    )[:N_CALLS]
    jax.block_until_ready(homogs[:n_big])

    # --- rhs_moments: production path per model ---
    if cached_pipeline:
        f_rhs_c = jax.jit(lambda t, p, h: lbs_kernels.rhs_moments_cached(
            t, p, h, gram.weights_pad, gram.sd_cm, layout=layout))
        jr = layout.jr
        timed('rhs_moments_cached', lambda x: f_rhs_c(*x),
              list(zip(tgts, pjs, homogs)),
              mxu_flops=(12 * layout.nt * jr  # blends, 1 pass
                         + 9 * jr                           # y dots, 3 passes
                         + 9 * E) * V_pad * B * 2,          # jac_proj
              hbm_bytes=tgt_bytes + homog_bytes)
    f_rhs = jax.jit(lambda t, p, f: lbs_kernels.rhs_moments(
        t, p, f, gram.weights_pad, gram.consts_pose, gram.sd_cm,
        layout=layout))
    jr = layout.jr
    nt = layout.nt
    consts_bytes_per_tile = V_pad * 4 * F * 4
    def n_tiles(tb_guess=256):
        return max(1, B // tb_guess)
    timed('rhs_moments (in-kernel homog)', lambda x: f_rhs(*x),
          list(zip(tgts, pjs, feats)),
          mxu_flops=(12 * nt * jr + 9 * jr + 9 * E
                     + 9 * F) * V_pad * B * 2,
          hbm_bytes=tgt_bytes
          + consts_bytes_per_tile * n_tiles(128 if cached_pipeline else 256))

    # --- recon: cached (production) and uncached ---
    xs = mk_inputs(N_CALLS, lambda i: feat(i, E))
    f_rec_c = jax.jit(lambda t, p, x, h: lbs_kernels.recon_part_sums_cached_lm(
        t, p, x, gram.sd_cm, h, plan.pm_t_pad, gram.weights_pad,
        layout=layout))
    timed('recon_part_sums_cached_lm', lambda x: f_rec_c(*x),
          list(zip(tgts, pjs, xs, homogs)),
          mxu_flops=(12 * nt * jr   # blends
                     + 2 * (9 + 3 + 3) * J) * V_pad * B * 2,  # part dots, 2-pass
          hbm_bytes=tgt_bytes + homog_bytes)
    featsE = mk_inputs(N_CALLS, lambda i: feat(i, F + E))
    f_rec = jax.jit(lambda t, p, f: lbs_kernels.recon_part_sums_lm(
        t, p, f, gram.weights_pad, gram.consts_full, plan.pm_t_pad,
        layout=layout))
    timed('recon_part_sums_lm (uncached)', lambda x: f_rec(*x),
          list(zip(tgts, pjs, featsE)),
          mxu_flops=(12 * nt * jr + 9 * (F + E)
                     + 2 * 15 * J) * V_pad * B * 2,
          hbm_bytes=tgt_bytes + V_pad * 4 * (F + E) * 4
          * n_tiles(128 if cached_pipeline else 256))

    # --- part_sums_vm --- (distinct ref_vm per call defeats memoization)
    ref_vms = mk_inputs(N_CALLS, lambda i: jnp.asarray(
        rng.normal(0, 0.5, (3, V_pad, 1)).astype(np.float32)))
    f_ps = jax.jit(lambda t, r: lbs_kernels.part_sums_vm_lm(
        t, r, plan.pm_t_pad))
    timed('part_sums_vm_lm', lambda x: f_ps(*x), list(zip(tgts, ref_vms)),
          mxu_flops=2 * 15 * J * V_pad * B * 2, hbm_bytes=tgt_bytes)

    # --- lbs_points ---
    f_lbs = jax.jit(lambda p, f: lbs_kernels.lbs_points(
        p, f, gram.weights_pad, gram.consts_full))
    timed('lbs_points', lambda x: f_lbs(*x), list(zip(pjs, featsE)),
          mxu_flops=(12 * nt * jr + 9 * (F + E))
          * V_pad * B * 2,
          hbm_bytes=homog_bytes + V_pad * 4 * (F + E) * 4
          * n_tiles(128 if cached_pipeline else 256))

    # --- wgram_moments (runtime-omega weighted solve) ---
    omegas = (
        [jnp.asarray((0.2 + rng.random((V, B))).astype(np.float32))
         for _ in range(n_big)] * N_CALLS
    )[:N_CALLS]
    jax.block_until_ready(omegas[:n_big])
    t4s = mk_inputs(N_CALLS, lambda i: jnp.asarray(
        rng.normal(0, 1, (3 * E, J, B)).astype(np.float32)))
    mu0 = jnp.zeros((3 * E, B), jnp.float32)
    f_wg = jax.jit(lambda t, p, h, t4, om: lbs_kernels.wgram_moments(
        t, p, h, t4, gram.weights_pad, gram.sd_cm, mu0, om,
        layout=layout_w))
    jr_w = layout_w.jr
    jp_w = layout_w.jp
    timed('wgram_moments (cached homog)', lambda x: f_wg(*x),
          list(zip(tgts, pjs, homogs, t4s, omegas)),
          mxu_flops=(12 + 3 * E) * layout_w.nt * jr_w
          * V_pad * B * 2,
          hbm_bytes=2 * tgt_bytes + homog_bytes  # tgt + omega + homog
          + 3 * E * layout_w.nt * jp_w * B * 4
          * max(1, B // 128))

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

    if not args.bwd:
        return

    # --- backward kernels (the custom-VJP passes of the grad recipe) ---
    # Measured at the PRODUCTION grad chunk (get_fit_grad_fn chunk=128): a
    # batch-grid of one is also what lets these kernels fit scoped VMEM —
    # with a single batch tile Mosaic needs no second buffer for the
    # batch-indexed blocks, while any larger grid double-buffers them
    # (measured: _rhs_moments_bwd at B=4096/tb=128 wants 19.6 MB > 16 MB).
    Bb = min(B, 128)
    print(f'--- grad-chunk kernels: lax.scan over {max(1, B // Bb)} chunks '
          f'of b{Bb} in ONE jit (the production grad program shape; isolated '
          f'b{Bb} calls are dispatch-overhead-dominated) ---')
    NCH = min(32, max(1, B // Bb))
    N_SETS = 4

    def timed_scan(name, fn, sets):
        """Each set is a tuple of (NCH, ...)-stacked chunk inputs; the row is
        the per-chunk time inside a jitted lax.scan over the NCH chunks."""
        def prog(*stacked):
            def body(c, xs):
                return c, fn(*xs)
            _, ys = jax.lax.scan(body, 0, stacked)
            return ys
        dt = timed(f'{name} (scan/{NCH})', lambda x: jax.jit(prog)(*x), sets)
        print(f'{"":34s} {dt * 1e3 / NCH:8.3f} ms/chunk(b{Bb})'
              f'  -> {dt * 1e3 / NCH * (B // Bb):6.2f} ms/b{B}', flush=True)

    def stackb(maker):
        return [
            jnp.asarray(np.stack([maker() for _ in range(NCH)]))
            for _ in range(N_SETS)
        ]

    s_tgt = stackb(lambda: rng.normal(0, 0.5, (3, V, Bb)).astype(np.float32))
    s_pj = stackb(lambda: rng.normal(0, 1, (12, J, Bb)).astype(np.float32))
    s_feat = stackb(lambda: rng.normal(0, 1, (F, Bb)).astype(np.float32))
    s_featE = stackb(
        lambda: rng.normal(0, 1, (F + E, Bb)).astype(np.float32))
    s_x = stackb(lambda: rng.normal(0, 1, (E, Bb)).astype(np.float32))
    s_gr = stackb(lambda: rng.normal(0, 1, (E, Bb)).astype(np.float32))
    s_gy = stackb(lambda: rng.normal(0, 1, (3, J, Bb)).astype(np.float32))
    s_graw = stackb(lambda: rng.normal(0, 1, (9, J, Bb)).astype(np.float32))
    s_h = stackb(
        lambda: rng.normal(0, 1, (3, V_pad, Bb)).astype(np.float32))
    jax.block_until_ready([s_tgt, s_h])

    # Forward kernels at the chunk shape (the VJP's primal re-run):
    timed_scan('rhs_moments fwd', lambda t, p, f: lbs_kernels.rhs_moments(
        t, p, f, gram.weights_pad, gram.consts_pose, gram.sd_cm,
        layout=layout), list(zip(s_tgt, s_pj, s_feat)))
    timed_scan(
        'recon_cached fwd',
        lambda t, p, x, h: lbs_kernels.recon_part_sums_cached_lm(
            t, p, x, gram.sd_cm, h, plan.pm_t_pad, gram.weights_pad,
            layout=layout), list(zip(s_tgt, s_pj, s_x, s_h)))

    if cached_pipeline:
        timed_scan(
            'rhs_cached bwd',
            lambda t, p, h, gr, gy: lbs_kernels._rhs_cached_bwd(
                t, p, h, gram.weights_pad, gram.sd_cm, gr, gy,
                layout=layout),
            list(zip(s_tgt, s_pj, s_h, s_gr, s_gy)))
    timed_scan(
        'rhs_moments bwd',
        lambda t, p, f, gr, gy: lbs_kernels._rhs_moments_bwd(
            t, p, f, gram.weights_pad, gram.consts_pose, gram.sd_cm, gr, gy,
            layout=layout),
        list(zip(s_tgt, s_pj, s_feat, s_gr, s_gy)))
    timed_scan(
        'recon_part_sums bwd',
        lambda t, p, f, graw, gst, gsa: lbs_kernels._recon_part_sums_bwd(
            t, p, f, gram.weights_pad, gram.consts_full, plan.pm_t_pad,
            graw, gst, gsa, layout=layout),
        list(zip(s_tgt, s_pj, s_featE, s_graw, s_gy, s_gy)))
    timed_scan(
        'recon_cached bwd',
        lambda t, p, x, h, graw, gst, gsa: lbs_kernels._recon_cached_bwd(
            t, p, x, gram.sd_cm, h, plan.pm_t_pad, gram.weights_pad,
            layout, graw, gst, gsa),
        list(zip(s_tgt, s_pj, s_x, s_h, s_graw, s_gy, s_gy)))
    timed_scan(
        'lbs_points bwd',
        lambda p, f, g: lbs_kernels._lbs_points_bwd(
            p, f, gram.weights_pad, gram.consts_full, g, False),
        list(zip(s_pj, s_featE, s_h)))


if __name__ == '__main__':
    main()
