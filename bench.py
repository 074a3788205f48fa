"""Headline benchmark: BodyFitter.fit throughput at batch 4096 (SMPL shapes).

Matches the reference's headline configuration (README.md:15 there): SMPL,
full 6890 vertices, num_iter=3, final rotation adjustment on, batch 4096 —
9,481 fits/s on an RTX 3090. Synthetic model weights at real tensor shapes
(licensed files are not redistributable; FLOP counts are identical).

Measurement notes (hard-won on the tunneled-TPU environment):
 - every rep uses DISTINCT device-resident inputs — the remote runtime
   memoizes repeated identical executions, which would fake the timing;
 - throughput is measured pipelined (enqueue all reps, sync once): the
   per-dispatch round-trip latency (~25 ms over the tunnel) overlaps with
   execution, as it does in production serving. Per-call latency is also
   reported on stderr.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is vs the reference's 9,481 fits/s.
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
# 32 distinct in-flight reps: the tunnel's fixed pipeline overhead (~29 ms
# per run, measured by sweeping the pipeline depth) amortizes to <1 ms/batch.
# The distinct-target HBM footprint (32 x 339 MB = 10.9 GB) fits v5e's 16 GB
# only because main() frees it before the secondary stages run.
REPS = int(os.getenv('BENCH_REPS', '32'))


def main() -> None:
    import jax

    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import smplfitter_tpu
    from smplfitter_tpu.utils import synthetic

    models_dir = synthetic.ensure_cached_models()
    bm = smplfitter_tpu.BodyModel('smpl', 'neutral', model_root=models_dir + '/smpl')
    fitter = smplfitter_tpu.BodyFitter(bm)

    rng = np.random.default_rng(0)
    fwd = jax.jit(lambda p, b, t: bm(pose_rotvecs=p, shape_betas=b, trans=t))
    targets = []
    for _ in range(REPS):
        pose = rng.normal(0, 0.3, (BATCH, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (BATCH, 10)).astype(np.float32)
        trans = rng.normal(0, 0.5, (BATCH, 3)).astype(np.float32)
        res = fwd(pose, betas, trans)
        targets.append((res['vertices'], res['joints']))
    jax.block_until_ready(targets)

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

    t0 = time.perf_counter()
    out = jax.block_until_ready(fit_fn(*targets[0]))
    compile_s = time.perf_counter() - t0

    # Per-call latency (sync every call, distinct inputs).
    lat = []
    for tv, tj in targets[1:]:
        t0 = time.perf_counter()
        out = jax.block_until_ready(fit_fn(tv, tj))
        lat.append(time.perf_counter() - t0)

    # Pipelined throughput (enqueue all, sync once).
    t0 = time.perf_counter()
    outs = [fit_fn(tv, tj) for tv, tj in targets]
    jax.block_until_ready(outs)
    wall = time.perf_counter() - t0
    fits_per_sec = REPS * BATCH / wall

    # Fit-quality guard: reconstruct from fitted params and measure v2v.
    refit = jax.block_until_ready(
        fwd(out['pose_rotvecs'], out['shape_betas'], out['trans'])
    )
    v2v = float(
        np.mean(
            np.linalg.norm(
                np.asarray(refit['vertices']) - np.asarray(targets[-1][0]), axis=-1
            )
        )
    )

    # Oracle parity gate: a batch-32 fit must match the reference NumPy
    # backend on the same synthetic model (betas within 1e-3, reconstruction
    # v2v within 0.01 mm of the oracle's). A kernel-precision regression
    # fails the bench loudly instead of shipping a green number.
    parity = parity_gate(jax, models_dir, fitter, fwd)

    print(
        json.dumps(
            dict(
                metric=f'fit_throughput_smpl_b{BATCH}_iter{NUM_ITER}',
                value=round(fits_per_sec, 1),
                unit='fits/s',
                vs_baseline=round(fits_per_sec / BASELINE_FITS_PER_SEC, 3),
                parity=None if parity is None else parity['ok'],
            )
        ),
        flush=True,
    )
    print(
        f'# batch={BATCH} pipelined={wall / REPS * 1e3:.1f}ms/batch '
        f'latency_min={min(lat) * 1e3:.1f}ms compile={compile_s:.0f}s '
        f'v2v_roundtrip={v2v * 1e3:.2f}mm device={jax.devices()[0].device_kind}',
        file=sys.stderr,
    )

    if os.getenv('BENCH_SECONDARY', '1') == '1':
        # Free the headline stage's in-flight targets (REPS x 340 MB) before
        # the secondary stages allocate theirs.
        del targets, outs, out, refit
        try:
            secondary(jax, smplfitter_tpu, models_dir, rng)
        except Exception as e:  # secondary metrics are informational only
            print(f'# secondary benchmarks failed: {e!r}', file=sys.stderr)

    if parity is not None and not parity['ok']:
        sys.exit(1)


def parity_gate(jax, models_dir, fitter, fwd):
    """Compare a batch-32 fit against the reference NumPy oracle.

    Returns dict(ok, max_dbetas, v2v_ours_mm, v2v_ref_mm) or None when the
    reference is unavailable. Thresholds: max|Δbetas| ≤ 1e-3 and
    |v2v_ours − v2v_ref| ≤ 0.01 mm.
    """
    ref_src = '/root/reference/src'
    if not os.path.isdir(ref_src):
        print('# parity: reference oracle unavailable, skipped', file=sys.stderr)
        return None
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    try:
        import smplfitter.np as ref_np
    except Exception as e:
        print(f'# parity: reference import failed ({e!r}), skipped', file=sys.stderr)
        return None

    rng = np.random.default_rng(3)
    B = 32
    pose = rng.normal(0, 0.3, (B, 72)).astype(np.float32)
    betas = rng.normal(0, 1, (B, 10)).astype(np.float32)
    trans = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
    res = jax.block_until_ready(fwd(pose, betas, trans))
    tv, tj = np.asarray(res['vertices']), np.asarray(res['joints'])

    fit_kw = dict(
        num_iter=NUM_ITER, beta_regularizer=1.0, final_adjust_rots=True,
        requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
    )
    fit_fn = jax.jit(lambda v, j: fitter.fit(v, j, **fit_kw))
    ours = jax.block_until_ready(fit_fn(tv, tj))

    ref_model = ref_np.BodyModel(
        'smpl', 'neutral', model_root=models_dir + '/smpl', num_betas=10
    )
    ref = ref_np.BodyFitter(ref_model).fit(
        target_vertices=tv, target_joints=tj,
        num_iter=NUM_ITER, beta_regularizer=1.0, final_adjust_rots=True,
        requested_keys=list(fit_kw['requested_keys']),
    )

    max_dbetas = float(
        np.max(np.abs(np.asarray(ours['shape_betas']) - ref['shape_betas']))
    )

    def recon_v2v(params):
        re = jax.block_until_ready(
            fwd(
                np.asarray(params['pose_rotvecs'], np.float32),
                np.asarray(params['shape_betas'], np.float32),
                np.asarray(params['trans'], np.float32),
            )
        )
        return float(
            np.mean(np.linalg.norm(np.asarray(re['vertices']) - tv, axis=-1)) * 1e3
        )

    v2v_ours = recon_v2v(ours)
    v2v_ref = recon_v2v(ref)
    ok = max_dbetas <= 1e-3 and abs(v2v_ours - v2v_ref) <= 0.01
    print(
        f'# parity: ok={ok} max|dbetas|={max_dbetas:.2e} '
        f'v2v ours={v2v_ours:.4f}mm ref={v2v_ref:.4f}mm',
        file=sys.stderr,
    )
    return dict(ok=ok, max_dbetas=max_dbetas, v2v_ours_mm=v2v_ours, v2v_ref_mm=v2v_ref)


def secondary(jax, smplfitter_tpu, models_dir, rng) -> None:
    """Secondary reference configs (reported on stderr):
    - batch 16384 fit on a 1024-vertex subset (reference: 440 ms/batch on 3090)
    - forward pass with vertices (reference PT/GPU: 64k/s at batch 64).
    """
    import time

    import numpy as np

    # Large-batch subset fit.
    bm_sub = smplfitter_tpu.BodyModel(
        'smpl', 'neutral', model_root=models_dir + '/smpl', vertex_subset_size=1024
    )
    fitter_sub = smplfitter_tpu.BodyFitter(bm_sub)
    B2 = 16384
    fwd_sub = jax.jit(lambda p, b: bm_sub(pose_rotvecs=p, shape_betas=b))
    subsets = []
    for _ in range(6):
        pose = rng.normal(0, 0.3, (B2, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (B2, 10)).astype(np.float32)
        res = fwd_sub(pose, betas)
        subsets.append((res['vertices'], res['joints']))
    jax.block_until_ready(subsets)
    fit_sub = jax.jit(
        lambda tv, tj: fitter_sub.fit(
            tv, tj, num_iter=NUM_ITER, beta_regularizer=1.0, final_adjust_rots=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
    )
    jax.block_until_ready(fit_sub(*subsets[0]))
    t0 = time.perf_counter()
    outs = [fit_sub(tv, tj) for tv, tj in subsets]
    jax.block_until_ready(outs)
    wall = (time.perf_counter() - t0) / len(subsets)
    print(
        f'# secondary: fit b{B2} v1024-subset: {wall * 1e3:.1f} ms/batch '
        f'({B2 / wall:,.0f} fits/s; reference 3090: 440 ms/batch)',
        file=sys.stderr,
    )

    # Small-batch regime (reference: 1,839 fits/s at batch 32 on a 3090).
    B3 = 32
    small = []
    for _ in range(64):
        pose = rng.normal(0, 0.3, (B3, 72)).astype(np.float32)
        betas = rng.normal(0, 1, (B3, 10)).astype(np.float32)
        small.append((pose, betas))
    bm_s = smplfitter_tpu.BodyModel('smpl', 'neutral', model_root=models_dir + '/smpl')
    fitter_s = smplfitter_tpu.BodyFitter(bm_s)
    fwd_s = jax.jit(lambda p, b: bm_s(pose_rotvecs=p, shape_betas=b))
    small = [fwd_s(p, b) for p, b in small]
    small = [(r['vertices'], r['joints']) for r in small]
    jax.block_until_ready(small)
    fit_s = jax.jit(
        lambda tv, tj: fitter_s.fit(
            tv, tj, num_iter=NUM_ITER, beta_regularizer=1.0, final_adjust_rots=True,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
    )
    jax.block_until_ready(fit_s(*small[0]))
    t0 = time.perf_counter()
    outs = [fit_s(tv, tj) for tv, tj in small]
    jax.block_until_ready(outs)
    wall = time.perf_counter() - t0
    print(
        f'# secondary: fit b{B3} (small-batch, {len(small)} in flight): '
        f'{len(small) * B3 / wall:,.0f} fits/s '
        f'({wall / len(small) * 1e3:.2f} ms/batch; reference 3090: 1,839 fits/s)',
        file=sys.stderr,
    )

    # Forward throughput (with vertices), full model, batch 4096.
    bm = smplfitter_tpu.BodyModel('smpl', 'neutral', model_root=models_dir + '/smpl')
    fwd = jax.jit(lambda p, b: bm(pose_rotvecs=p, shape_betas=b))
    ins = []
    for _ in range(16):
        pose = jax.numpy.asarray(rng.normal(0, 0.3, (BATCH, 72)).astype(np.float32))
        betas = jax.numpy.asarray(rng.normal(0, 1, (BATCH, 10)).astype(np.float32))
        ins.append((pose, betas))
    jax.block_until_ready(ins)
    jax.block_until_ready(fwd(*ins[0]))
    t0 = time.perf_counter()
    outs = [fwd(p, b) for p, b in ins]
    jax.block_until_ready(outs)
    wall = (time.perf_counter() - t0) / len(ins)
    print(
        f'# secondary: forward(vertices) b{BATCH}: {wall * 1e3:.2f} ms/batch '
        f'({BATCH / wall:,.0f}/s; reference 4090 PT-compile: 64,000/s)',
        file=sys.stderr,
    )

    # SMPL -> SMPL-X conversion (reference: 43 ms for 33 meshes at num_iter=1,
    # 75 ms at 2, on GPU; docs/smpl_to_smplx.rst there). Opt-in: the SMPL-X
    # fit graph takes >10 min on this environment's remote AOT compiler the
    # first time (persistent-cached afterwards).
    if os.getenv('BENCH_CONVERT', '0') != '1':
        return
    try:
        import os as _os

        from smplfitter_tpu.utils import synthetic as _synth

        full_dir = _synth.ensure_cached_models(full=True)
        # Converter assets resolve via $DATA_ROOT/body_models.
        link_parent = _os.path.join(_os.path.dirname(full_dir), 'full_env_root')
        _os.makedirs(link_parent, exist_ok=True)
        link = _os.path.join(link_parent, 'body_models')
        if not _os.path.islink(link):
            _os.symlink(full_dir, link)
        _os.environ['SMPLFITTER_BODY_MODELS'] = full_dir
        _os.environ['DATA_ROOT'] = link_parent
        smpl_in = smplfitter_tpu.BodyModel('smpl', 'neutral')
        smplx_out = smplfitter_tpu.BodyModel('smplx', 'neutral')
        conv = smplfitter_tpu.BodyConverter(smpl_in, smplx_out)
        Bc = 33
        convert = jax.jit(lambda p, b, t: conv.convert(p, b, t, num_iter=1))
        ins_c = []
        for _ in range(8):
            ins_c.append((
                jax.numpy.asarray(rng.normal(0, 0.3, (Bc, 72)).astype(np.float32)),
                jax.numpy.asarray(rng.normal(0, 1, (Bc, 10)).astype(np.float32)),
                jax.numpy.asarray(rng.normal(0, 0.5, (Bc, 3)).astype(np.float32)),
            ))
        jax.block_until_ready(convert(*ins_c[0]))
        t0 = time.perf_counter()
        outs = [convert(*i) for i in ins_c]
        jax.block_until_ready(outs)
        wall = (time.perf_counter() - t0) / len(ins_c)
        print(
            f'# secondary: smpl->smplx convert b{Bc} iter1: {wall * 1e3:.1f} ms/batch '
            f'(reference GPU: 43 ms for the same 33-mesh setup)',
            file=sys.stderr,
        )
    except Exception as e:
        print(f'# secondary converter benchmark skipped: {e!r}', file=sys.stderr)


if __name__ == '__main__':
    main()
