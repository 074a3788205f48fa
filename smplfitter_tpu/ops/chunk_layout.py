"""Skinning-locality chunk layout: the static reordering that shrinks the
fused kernels' blend contraction from K = 6·J to K = 6·Jr, Jr ≪ J.

The LBS blend dots contract over the K-packed joint axis (6 bf16 terms per
joint, see ops/lbs_kernels._pack6_lhs). Mosaic pads the contraction dim to
multiples of 128 lanes, so SMPL's K = 6·24 = 144 costs two K-tiles (256) and
SMPL-X's K = 330 costs three. But skinning weights are LOCAL: each vertex is
influenced by a handful of kinematically adjacent joints. Two static
reorderings expose that locality to the kernels:

 1. **Joints in depth-first tree order** — every subtree becomes a contiguous
    index range, so the joint set touching a spatially local patch of the
    mesh is (nearly) an interval.
 2. **Vertices sorted by the DFS position of their dominant-weight joint** —
    each fixed-size vertex chunk of the kernel grid then touches a short
    contiguous DFS joint range.

Per chunk k the layout records a static range ``[start_k, start_k + jr)`` of
DFS joint positions covering every nonzero weight in the chunk (jr shared
across chunks, padded to a lane-friendly multiple). Kernels slice the
``(12, 6J, B)`` K-packed joint operand at the (runtime-prefetched) sublane
offset ``6·start_k`` and contract against per-chunk packed weight columns —
one MXU K-tile instead of two/three. Measured on synthetic SMPL: max range
12 of 24 joints; SMPL-X 28 of 55; MANO 16 of 16 (degenerate, zero overhead).

All reordering is HOST-side precompute (NumPy): the per-vertex static kernel
operands are built permuted once, targets are permuted during their one
component-major relayout, and all kernel outputs are either vertex sums
(permutation-invariant) or carry a cheap J-sized un-permute in the glue.

Default policy: the vertex sort is OPT-IN (see build_chunk_layout) — on this
hardware the target permutation gather (~2.4 ms/fit at b4096) costs more
than the saved blend K-tile, so subsetting activates only when the model's
CANONICAL vertex order already yields compact ranges (free — no gather).
Spatially coherent real meshes qualify; scattered orders fall back to the
full-width kernels with zero overhead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


def dfs_joint_order(kintree_parents) -> np.ndarray:
    """Depth-first order of the kinematic tree: array of original joint ids.

    Children are visited in ascending id order, so every subtree occupies a
    contiguous range of DFS positions.
    """
    parents = list(kintree_parents)
    J = len(parents)
    children: list[list[int]] = [[] for _ in range(J)]
    for j in range(1, J):
        children[parents[j]].append(j)
    order, stack = [], [0]
    while stack:
        j = stack.pop()
        order.append(j)
        stack.extend(reversed(children[j]))
    return np.asarray(order, np.int64)


def _round_down(x: int, m: int) -> int:
    return (x // m) * m


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class ChunkLayout:
    """Static joint/vertex reordering + per-chunk blend ranges (host data)."""

    jperm: np.ndarray  # (J,) original joint id at each DFS position
    jpos: np.ndarray  # (J,) DFS position of each original joint
    vperm: np.ndarray  # (V,) original vertex id at each new position
    vperm_inv: np.ndarray  # (V,) new position of each original vertex
    jr: int  # shared subset width (multiple of 4; == J when degenerate)
    jp: int  # padded joint-axis length: every [start, start+jr) fits in it
    starts: np.ndarray  # (nchunks,) DFS range start per chunk (mult of 8)
    chunk: int  # vertex chunk size the starts were computed for

    @property
    def degenerate(self) -> bool:
        return self.jr == len(self.jperm)


def build_chunk_layout(weights: np.ndarray, kintree_parents, chunk: int,
                       start_align: int = 8,
                       sort_vertices: bool = False) -> ChunkLayout:
    """Compute the reordering + per-chunk ranges for ``chunk``-row kernels.

    ``weights``: (V, J) skinning weights in canonical (model-file) order.
    ``start_align``: starts are multiples of this (8 → both the K offsets
    6·start and the subset-output sublane store offsets are 8-aligned).
    Ranges may then extend past J; ``jp`` is the zero-padded joint-axis
    length that contains every range (packed operands pad to it).

    ``sort_vertices=False`` (the default) keeps the CANONICAL vertex order:
    real SMPL-family meshes are spatially coherent, so canonical chunks
    already have compact DFS joint ranges and the subsetting is free. The
    explicit part-sort (True) guarantees compact ranges for ANY ordering but
    requires permuting the targets at ingestion — measured at b4096/SMPL the
    XLA gather costs ~2.4 ms/fit, MORE than the one saved blend K-tile
    (~0.9 ms), so it is opt-in. Incoherent orders under the default simply
    come out degenerate (full-width kernels, zero overhead).
    """
    w = np.asarray(weights)
    V, J = w.shape
    jperm = dfs_joint_order(kintree_parents)
    assert len(jperm) == J
    jpos = np.empty(J, np.int64)
    jpos[jperm] = np.arange(J)

    if sort_vertices:
        assign = np.argmax(w, axis=1)
        vperm = np.argsort(jpos[assign], kind='stable')
    else:
        vperm = np.arange(V)
    vperm_inv = np.empty(V, np.int64)
    vperm_inv[vperm] = np.arange(V)

    w_sorted = w[vperm]
    nchunks = -(-V // chunk)
    los, his = [], []
    for k in range(nchunks):
        rows = w_sorted[k * chunk:(k + 1) * chunk]
        nz = np.where(np.any(rows != 0, axis=0))[0]
        pos = jpos[nz]
        los.append(int(pos.min()) if len(pos) else 0)
        his.append(int(pos.max()) if len(pos) else 0)

    width = max(
        hi + 1 - _round_down(lo, start_align) for lo, hi in zip(los, his)
    )
    jr = min(_round_up(width, 4), J)
    if jr >= J - 3:
        # Degenerate: ranges nearly span the joint axis — use the full width
        # (starts all 0), which reproduces the unsubsetted kernels exactly.
        jr = J
    starts = np.zeros(nchunks, np.int32)
    if jr < J:
        for k, (lo, hi) in enumerate(zip(los, his)):
            s = _round_down(lo, start_align)
            assert s + jr >= hi + 1, (k, lo, hi, s, jr)
            starts[k] = s
    jp = max(J, int(starts.max()) + jr)
    return ChunkLayout(
        jperm=jperm, jpos=jpos, vperm=vperm, vperm_inv=vperm_inv,
        jr=int(jr), jp=int(jp), starts=starts, chunk=chunk,
    )


def identity_layout(V: int, J: int, chunk: int) -> ChunkLayout:
    """No reordering, full-width ranges (the packing layout still applies)."""
    ar = np.arange
    return ChunkLayout(
        jperm=ar(J), jpos=ar(J), vperm=ar(V), vperm_inv=ar(V),
        jr=J, jp=J, starts=np.zeros(-(-V // chunk), np.int32), chunk=chunk,
    )


# --- host-side 6-term K-packing (j-major layout) ---------------------------
# Trace-time twin: ops/lbs_kernels._pack6_rhs_j. The 6 terms per joint are
# CONTIGUOUS (j-major), so a contiguous DFS joint range [s, s+jr) is the
# contiguous K range [6s, 6(s+jr)) — this is what makes the per-chunk dynamic
# slice possible. Pairing per joint: lhs [a0,a0,a1,a0,a1,a2] with rhs
# [b0,b1,b0,b2,b1,b0] (all cross terms of the 3-way bf16 splits down to
# 2^-16, accumulating a0b0 + (a0b1+a1b0) + (a0b2+a1b1+a2b0) in f32).

def _lhs_terms(nt: int):
    # stay in sync with the kernels' packing (lbs_kernels.pick_blend_terms)
    from . import lbs_kernels

    return lbs_kernels._terms(nt)[0]


def _trunc_bf16_np(x: np.ndarray) -> np.ndarray:
    u = x.astype(np.float32).view(np.uint32)
    return (u & np.uint32(0xFFFF0000)).view(np.float32)


def split3_np(x: np.ndarray):
    """3-way bf16-representable decomposition (host twin of
    lbs_kernels._split3_bf16)."""
    x = np.asarray(x, np.float32)
    x0 = _trunc_bf16_np(x)
    r = x - x0
    x1 = _trunc_bf16_np(r)
    x2 = _trunc_bf16_np(r - x1)
    return x0, x1, x2


def pack6_lhs_j_np(w_cols: np.ndarray, nt: int) -> np.ndarray:
    """(V, Jr) weight columns -> (V, nt·Jr) j-major K-packed LHS."""
    s = split3_np(w_cols)
    stacked = np.stack([s[t] for t in _lhs_terms(nt)], axis=2)  # (V, Jr, T)
    return stacked.reshape(w_cols.shape[0], -1)


def build_blend_operands(weights: np.ndarray, layout: ChunkLayout,
                         v_pad: int):
    """Per-chunk packed static blend operands, in the layout's vertex order.

    Returns (wtsp_sub (v_pad, 6·jr), w_sub (v_pad, jr), starts (1, nchunks)):
    row-block k of wtsp_sub/w_sub holds chunk k's vertices' weights for its
    DFS joint range [starts_k, starts_k + jr) (columns in DFS order; ranges
    may extend into the zero pad [J, jp)).
    """
    from . import lbs_kernels

    w = np.asarray(weights, np.float32)
    V, J = w.shape
    w_sorted = np.zeros((V, layout.jp), np.float32)
    w_sorted[:, :J] = w[layout.vperm][:, layout.jperm]  # DFS cols, jp-padded
    chunk = layout.chunk
    nchunks = len(layout.starts)
    assert v_pad >= V and v_pad % chunk == 0 and nchunks == v_pad // chunk or (
        nchunks == -(-V // chunk)), (v_pad, V, nchunks, chunk)
    jr = layout.jr
    nt = lbs_kernels.pick_blend_terms(jr)
    wtsp_sub = np.zeros((v_pad, nt * jr), np.float32)
    w_sub = np.zeros((v_pad, jr), np.float32)
    for k in range(nchunks):
        lo = k * chunk
        hi = min((k + 1) * chunk, V)
        s = int(layout.starts[k])
        cols = w_sorted[lo:hi, s:s + jr]
        w_sub[lo:hi] = cols
        wtsp_sub[lo:hi] = pack6_lhs_j_np(cols, nt)
    starts = layout.starts.reshape(1, -1).astype(np.int32)
    return wtsp_sub, w_sub, starts
