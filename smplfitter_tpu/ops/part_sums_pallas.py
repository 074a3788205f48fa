"""Fused Pallas kernel for per-part sufficient statistics.

Computes, for target points t and reference points a (vertex-minor layout),
the per-part sums

    raw[b, j, c, d] = Σ_v pm[j, v] t[b, c, v] a[b, d, v]
    s_t[b, j, c]    = Σ_v pm[j, v] t[b, c, v]
    s_a[b, j, c]    = Σ_v pm[j, v] a[b, c, v]

in ONE pass over HBM. The XLA lowering of the same math materializes two
(B, 9, N) broadcast tensors (~1.2 GB each at batch 4096) before the membership
GEMM; here the 9 outer products are formed in VMEM scratch and contracted on
the MXU immediately, so t and a are read exactly once.

Grid: one program per batch tile. The reference side may be unbatched
(broadcast reference mesh): its BlockSpec then maps every program to block 0 —
no materialized broadcast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH_TILE = 16

# Off by default: measured end-to-end on v5e, the XLA lowering of part_sums
# with the vertex-minor (B, 9, N) outer layout is ~3% faster than this kernel
# (the kernel wins inside, but forcing its full-V transposed inputs to
# materialize costs more than the fused outer+GEMM saves). Kept as
# infrastructure: revisit with in-kernel transposition.
ENABLED = False


def _kernel(t_ref, a_ref, pm_ref, raw_ref, st_ref, sa_ref, scratch):
    tb = t_ref.shape[0]
    t = t_ref[:]  # (TB, 3, N)
    a = a_ref[:]  # (TB or 1, 3, N)
    n = t.shape[-1]
    a_b = a if a.shape[0] == tb else jnp.broadcast_to(a, (tb, 3, n))

    # Nine outer-product rows per instance, grouped (c*3+d, TB) so each slice
    # write is contiguous.
    for c in range(3):
        for d in range(3):
            scratch[(c * 3 + d) * tb : (c * 3 + d + 1) * tb, :] = (
                t[:, c, :] * a_b[:, d, :]
            )

    # Membership arrives as (J, N) — vertex-minor, so its VMEM tile is small
    # ((N, J) would lane-pad J to 128) — and is contracted over N directly.
    pm = pm_ref[:]  # (J, N)
    contract_n = (((1,), (1,)), ((), ()))
    raw_ref[:] = jax.lax.dot_general(
        scratch[:], pm, contract_n, preferred_element_type=jnp.float32
    ).reshape(raw_ref.shape)
    st_ref[:] = jax.lax.dot_general(
        t.reshape(tb * 3, n), pm, contract_n, preferred_element_type=jnp.float32
    ).reshape(st_ref.shape)
    sa_ref[:] = jax.lax.dot_general(
        a.reshape(a.shape[0] * 3, n), pm, contract_n, preferred_element_type=jnp.float32
    ).reshape(sa_ref.shape)


@functools.partial(jax.jit, static_argnames=('interpret',))
def part_sums_fused(tT: jax.Array, aT: jax.Array, pm_t: jax.Array,
                    interpret: bool = False):
    """Fused per-part statistics.

    Args:
        tT: (B, 3, N) targets, vertex-minor; N a multiple of 128.
        aT: (B, 3, N) or (1, 3, N) reference points.
        pm_t: (J, N) part membership (zero columns for unused/pad vertices).

    Returns:
        raw (B, J, 3, 3), s_t (B, J, 3), s_a (B, J, 3).
    """
    B, _, N = tT.shape
    J = pm_t.shape[0]
    assert B % BATCH_TILE == 0, 'pad the batch to a multiple of BATCH_TILE'
    tb = BATCH_TILE
    grid = (B // tb,)
    a_batched = aT.shape[0] != 1

    raw9, st, sa = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, 3, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tb if a_batched else 1, 3, N),
                (lambda i: (i, 0, 0)) if a_batched else (lambda i: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((J, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((9, tb, J), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 3, J), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tb if a_batched else 1, 3, J),
                (lambda i: (i, 0, 0)) if a_batched else (lambda i: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, B, J), tT.dtype),
            jax.ShapeDtypeStruct((B, 3, J), tT.dtype),
            jax.ShapeDtypeStruct((aT.shape[0], 3, J), tT.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((9 * tb, N), jnp.float32)],
        interpret=interpret,
    )(tT, aT, pm_t)

    # (9, B, J) with rows ordered (c*3+d) -> (B, J, 3, 3)
    raw = jnp.transpose(raw9, (1, 2, 0)).reshape(B, J, 3, 3)
    s_t = jnp.swapaxes(st, 1, 2)  # (B, J, 3)
    s_a = jnp.swapaxes(sa, 1, 2)
    return raw, s_t, s_a
