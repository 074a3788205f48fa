"""Microbenchmark the Mosaic MXU cost model for the dot shapes the fused
kernels use: how do M (output sublanes), K (contraction), N (lanes) pad?

Times a standalone pallas kernel that runs ``n_dots`` dot_generals per grid
step over REPS grid steps. Inputs are distinct per repetition and the
measurement is pipelined (the remote runtime memoizes identical executions
and per-dispatch latency is ~25 ms — see CLAUDE.md).

Usage: python benchmark/mxu_probe.py
"""

from __future__ import annotations

import functools
import os.path as _osp
import sys as _sys
import time

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_compilation_cache')

REPS = 4096   # grid steps per call
N_DOTS = 8    # dots per grid step
N_CALLS = 8   # pipelined calls with distinct inputs


def _probe_kernel(n_dots, dims, a_ref, b_ref, o_ref):
    # The step-dependent operand perturbation stops Mosaic/LLVM from hoisting
    # the loop-invariant dots out of the grid loop (measured: without it the
    # whole grid collapses to one dot's worth of time).
    step = pl.program_id(0).astype(jnp.float32)
    acc = None
    a = a_ref[:] + step
    for j in range(n_dots):
        r = jax.lax.dot_general(
            a + jnp.float32(j), b_ref[:], dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = r if acc is None else acc + r
    o_ref[:] += acc


@functools.partial(jax.jit, static_argnames=('n_dots', 'contract_lhs0'))
def probe(a, b, n_dots: int, contract_lhs0: bool):
    if contract_lhs0:
        dims = (((0,), (0,)), ((), ()))  # (K, M) x (K, N) -> (M, N)
        M = a.shape[1]
    else:
        dims = (((1,), (0,)), ((), ()))  # (M, K) x (K, N) -> (M, N)
        M = a.shape[0]
    N = b.shape[1]
    return pl.pallas_call(
        functools.partial(_probe_kernel, n_dots, dims),
        grid=(REPS,),
        in_specs=[
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )(a, b)


def time_case(label, M, K, N, contract_lhs0=False, n_dots=N_DOTS):
    rng = np.random.default_rng(0)
    a_shape = (K, M) if contract_lhs0 else (M, K)
    ains = [jnp.asarray(rng.normal(size=a_shape).astype(np.float32))
            for _ in range(N_CALLS)]
    b = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    # compile + warm
    probe(ains[0], b, n_dots, contract_lhs0).block_until_ready()
    t0 = time.perf_counter()
    outs = [probe(a, b, n_dots, contract_lhs0) for a in ains]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / N_CALLS
    total_dots = REPS * n_dots
    ns_per_dot = dt * 1e9 / total_dots
    eff = M * K * N / (dt / total_dots) / 1e12  # T-MAC/s effective
    print(f'{label:34s} M={M:4d} K={K:4d} N={N:4d}  '
          f'{ns_per_dot:8.1f} ns/dot  {eff:7.2f} T-MAC/s')
    return ns_per_dot


if __name__ == '__main__':
    print(f'devices: {jax.devices()}')
    for M in (8, 16, 24, 32, 64, 128, 256):
        time_case('M sweep (K=256, N=256)', M, 256, 256)
    print()
    for M in (8, 16, 24, 32, 64, 128, 256):
        time_case('M sweep C0_0 (K=256, N=256)', M, 256, 256, contract_lhs0=True)
    print()
    for K in (24, 48, 72, 96, 120, 128, 144, 192, 208, 256, 384, 512):
        time_case('K sweep (M=256, N=256)', 256, K, 256)
    print()
    for N in (128, 256):
        time_case('N sweep (M=256, K=256)', 256, 256, N)
