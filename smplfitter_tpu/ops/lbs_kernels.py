"""Fused component-major Pallas kernels for the fitting hot loop.

Convention: per-vertex activations live in COMPONENT-MAJOR layout
``(3, V_pad, B)`` — coordinate on the leading axis, vertices in sublanes, batch
in lanes. Every in-kernel operation is then strictly 2-D ((VC, TB) tiles and
(VC, .) x (., TB) dots): Mosaic's vector layouts never need lane-splitting or
lane-merging reshapes, which it does not support. None of the big per-vertex
intermediates (blended joint transforms, posed template, positions, residuals)
ever exist in HBM; targets are transposed into this layout once per fit.

Per-vertex kernels (grid = (batch_tiles, vertex_chunks); vertex chunks
innermost so per-batch-tile output blocks accumulate in VMEM across the
sweep; the targets' vertex dim may be non-VC-divisible — the edge chunk is
masked in-VMEM so no padded copy of the targets is ever materialized):

  - rhs_moments: extended-LBS positions + residuals against targets, reduced
    on the fly into the shape-solve right side r = Σ_v (R̄_v SD_v)ᵀ b_v (the
    rotation contraction folded in-kernel by reusing the LBS blends as R̄) and
    the skinning sums y = Σ_v w_vj b_v (Σ_v b_v follows from y since skinning
    weight rows sum to 1). Replaces ~8 HBM-sized XLA ops of the shape solve.
  - lbs_points: extended LBS -> per-vertex points, written component-major.
    Reconstructs the shape solve's fitted mesh (pos + jac·x) in ONE pass by
    folding the beta step into the homogeneous feature vector.
  - part_sums_vm: per-part sufficient statistics Σ pm t aᵀ / Σ pm t / Σ pm a
    for the rotation fits, reading t and a exactly once.

Plus one batch-only kernel (grid = (batch_tiles,)): gram_assembly, which
builds the shape solve's per-instance Gramian pieces from joint-space
operands (see its section below).

Everything is f32 with f32 MXU accumulation (preferred_element_type).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# --- kernel dot precision -------------------------------------------------
# The package-wide matmul precision is 'highest' (6 bf16 passes per f32 dot
# on the MXU). The kernels are MXU-bound, and their operands (skinning
# weights, rotations, metre-scale positions, O(1) moments) are comfortably
# conditioned for 3-pass f32 emulation (== jax Precision.HIGH, which Mosaic
# does not support natively). We emulate it explicitly: split each operand
# into bf16 hi + bf16 lo (~16 mantissa bits total) and take the three
# highest-order cross products, accumulating in f32. This halves MXU time
# versus 'highest' at ~1e-5 relative error - far inside the fit's f32
# parity envelope (verified end-to-end against the reference oracle).


def _split_bf16(x):
    # hi/lo are bf16-valued but stored f32: Mosaic's bf16-dtype matmuls don't
    # support all the dimension-number patterns used here, while f32 operands
    # under Precision.DEFAULT lower to exactly one bf16 MXU pass each.
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot3(a, b, dimension_numbers):
    """3-pass bf16 emulation of an f32 dot_general (Precision.HIGH)."""
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)


def _trunc_bf16(x):
    """Truncate to a bf16-REPRESENTABLE f32 by masking the low mantissa bits.

    The obvious ``x.astype(bf16).astype(f32)`` is NOT safe at the XLA level:
    under ``--xla_allow_excess_precision`` (on by default) XLA folds the
    precision-reducing convert pair to IDENTITY, which silently turns a
    packed operand back into the unsplit f32 array (x0 = x, x1 = x2 = 0) and
    collapses the emulated dot to single-bf16-pass accuracy (measured:
    1.6e-3 rel err instead of ~3e-7 on the fused kernels). A bitwise mask
    cannot be folded. Truncation (round-toward-zero) instead of RTN costs
    one mantissa bit per level — ~2^-21 coverage over three levels, still
    far below the old 3-pass path's ~5e-6 and the fit's parity envelope.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)


def _split3_bf16(x):
    """3-way bf16 decomposition x ~= x0 + x1 + x2 (each bf16-representable,
    stored f32): 8+8+8 mantissa bits, covering the f32 mantissa to ~2^-21.
    The residuals are exact f32 subtractions (Dekker-style splitting)."""
    x0 = _trunc_bf16(x)
    r = x - x0
    x1 = _trunc_bf16(r)
    x2 = _trunc_bf16(r - x1)
    return x0, x1, x2


def _dot1(a, b, dimension_numbers):
    """One MXU pass (operands must be bf16-representable, e.g. K-packed)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dot2_exact_a(a, b, dimension_numbers):
    """2-pass f32-emulated dot for an ``a`` that is EXACTLY bf16-representable
    (the 0/1 part-membership masks): a_lo == 0, so the a_lo x b_hi pass of
    :func:`_dot3` is identically zero and skipped. Bit-identical result."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    b_hi, b_lo = _split_bf16(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(a_hi, b_hi) + d(a_hi, b_lo)


_MM = (((1,), (0,)), ((), ()))  # standard 2-D matmul dimension numbers


def _mm3(a, b):
    return _dot3(a, b, _MM)


VC = 256  # vertex chunk (sublane dim of per-vertex tiles)


# --- j-major 6-term K-packing + per-chunk joint-subset layout --------------
# The LBS blends contract a K-packed joint axis. In the J-MAJOR packing the 6
# precision terms of each joint are CONTIGUOUS, so a contiguous (DFS-ordered)
# joint range [s, s+jr) is the contiguous K range [6s, 6s+6jr) — kernels can
# slice the (12, 6J, B) operand at a per-chunk sublane offset and contract
# against per-chunk packed weight columns: K = 6·jr (one MXU K-tile for
# SMPL's jr=16 vs two for the full 6·24) instead of 6·J. See
# ops/chunk_layout.py for the host-side reordering that makes the ranges
# short, and BlendLayout below for the operand bundle.

# 6-term packing = all split-pair products down to 2^-16 (full f32
# emulation). BLEND_TERMS=5 drops the single smallest term (a2*b0, the
# weights' third-order bits against the rotations' leading bits, ~2^-16
# relative on the blend) so SMPL's K drops from 6*24=144 (two MXU K-tiles)
# to 120 (one tile). Large-J models additionally drop a1*b1 (4-term packing,
# residual ~2·2^-16 on the blend) WHEN that saves a whole K tile — SMPL-X's
# K goes 5·55=275 (three tiles) -> 4·55=220 (two); models where 4 terms
# round to the same tile count keep 5 (see pick_blend_terms). Gated by the
# oracle parity check and BodyFitter.check_kernel_parity — set
# BLEND_TERMS = 6 to restore full emulation everywhere.
BLEND_TERMS = 5
_LHS_TERMS6 = (0, 0, 1, 0, 1, 2)
_RHS_TERMS6 = (0, 1, 0, 2, 1, 0)
_LHS_TERMS5 = (0, 0, 1, 0, 1)
_RHS_TERMS5 = (0, 1, 0, 2, 1)
_LHS_TERMS4 = (0, 0, 1, 0)
_RHS_TERMS4 = (0, 1, 0, 2)


def pick_blend_terms(jr: int) -> int:
    """Terms per joint for a blend contraction over ``jr`` joints: the
    narrowest packing whose accuracy class the parity gates accept AND that
    actually buys a K tile (K pads to 128 lanes)."""
    if BLEND_TERMS == 6:
        return 6
    if -(-5 * jr // 128) > -(-4 * jr // 128):
        return 4
    return 5


def _terms(nt: int):
    if nt == 6:
        return _LHS_TERMS6, _RHS_TERMS6
    if nt == 4:
        return _LHS_TERMS4, _RHS_TERMS4
    return _LHS_TERMS5, _RHS_TERMS5


def _interleave6(cat, axis, terms, J):
    # One static gather turns the term-major concat [x0|x1|x2] into the
    # j-major interleave — measured far cheaper than stack+reshape, whose
    # XLA lowering materializes strided copies per term (~2.6 ms/fit of
    # copy/bitcast fusions at b4096).
    idx = np.array([t * J + j for j in range(J) for t in terms])
    return jnp.take(cat, jnp.asarray(idx), axis=axis)


def _pack6_lhs_j(a, axis, nt: int):
    """j-major K-packed LHS: per-joint term blocks (``nt`` of them, see
    pick_blend_terms) are contiguous along the expanded ``axis``."""
    cat = jnp.concatenate(_split3_bf16(a), axis=axis)
    return _interleave6(cat, axis, _terms(nt)[0], a.shape[axis])


def _pack6_rhs_j(b, axis, nt: int):
    """j-major K-packed RHS twin of :func:`_pack6_lhs_j`."""
    cat = jnp.concatenate(_split3_bf16(b), axis=axis)
    return _interleave6(cat, axis, _terms(nt)[1], b.shape[axis])


from flax import struct as _struct


@_struct.dataclass
class BlendLayout:
    """Static per-chunk joint-subset operands for the LBS blend dots.

    ``wtsp_sub`` row-block k holds chunk k's vertices' K-packed weights for
    its DFS joint range; ``w_sub`` the plain (unpacked) columns; ``starts``
    the per-chunk DFS range starts (multiples of 4 → K offsets 6·s are
    sublane-aligned). ``jperm`` is the DFS joint order the packed operands
    use (kernel outputs over the subset axis come back in DFS positions and
    are un-permuted by the public wrappers). A degenerate layout
    (jr == J, identity jperm, zero starts) reproduces the full-width kernels
    exactly — it is what :func:`default_layout` builds when no precomputed
    layout is supplied (e.g. in unit tests).
    """

    wtsp_sub: jax.Array  # (V_pad, 6*jr)
    w_sub: jax.Array  # (V_pad, jr)
    starts: jax.Array  # (1, nchunks) int32
    jr: int = _struct.field(pytree_node=False)
    jp: int = _struct.field(pytree_node=False)  # padded joint-axis length
    jperm: tuple = _struct.field(pytree_node=False)

    @property
    def nt(self) -> int:
        """Blend terms per joint for THIS layout (pick_blend_terms(jr)) —
        deterministic from jr, so the trace-time packers and the host-side
        GramData packers always agree."""
        return pick_blend_terms(self.jr)

    @property
    def full(self) -> bool:
        """Full-width layout: every chunk uses the whole joint axis (starts
        all zero by construction), so kernels take static offsets."""
        return self.jr == self.jp

    @property
    def identity_j(self) -> bool:
        return self.jperm == tuple(range(len(self.jperm)))


def default_layout(weights_pad, chunk: int = VC) -> BlendLayout:
    """Trace-time degenerate layout: full joint width, no reordering."""
    v_pad, J = weights_pad.shape
    return BlendLayout(
        wtsp_sub=_pack6_lhs_j(weights_pad, axis=1, nt=pick_blend_terms(J)),
        w_sub=weights_pad,
        starts=jnp.zeros((1, v_pad // chunk), jnp.int32),
        jr=J,
        jp=J,
        jperm=tuple(range(J)),
    )


def pack_pj(pj_cm, layout: BlendLayout):
    """K-pack a per-joint operand (e.g. (12, J, B) [R|t] entries) along its
    joint axis 1: DFS order, zero-padded to jp, j-major 6-term packed."""
    if not layout.identity_j:
        pj_cm = jnp.take(pj_cm, jnp.asarray(np.asarray(layout.jperm)), axis=1)
    J = pj_cm.shape[1]
    if layout.jp > J:
        pad = [(0, 0)] * pj_cm.ndim
        pad[1] = (0, layout.jp - J)
        pj_cm = jnp.pad(pj_cm, pad)
    return _pack6_rhs_j(pj_cm, axis=1, nt=layout.nt)


def unpermute_joints(x, layout: BlendLayout, axis: int = 1):
    """Map a kernel output whose joint axis is in (jp-padded) DFS positions
    back to canonical joint order (inverse of the layout's jperm)."""
    if layout.identity_j and layout.jp == len(layout.jperm):
        return x
    jperm = np.asarray(layout.jperm)
    jpos = np.empty(len(jperm), np.int64)
    jpos[jperm] = np.arange(len(jperm))
    return jnp.take(x, jnp.asarray(jpos), axis=axis)

_C0_0 = (((0,), (0,)), ((), ()))  # contract dim0 x dim0


FORCE_INTERPRET = False  # set True in tests to exercise kernels on CPU
_DISABLED = False


import contextlib


@contextlib.contextmanager
def disabled():
    """Trace-time switch to the pure-XLA paths (identical math; the general
    fallback for differentiation and non-kernel-eligible configurations)."""
    global _DISABLED
    prev = _DISABLED
    _DISABLED = True
    try:
        yield
    finally:
        _DISABLED = prev


# How BodyFitter.fit treats the kernel path when traced under autodiff:
#   'fallback' (default) — use the pure-XLA formulation (identical math; the
#       kernels' custom-VJP backward graphs of a FULL fit can strain AOT
#       compilers, cf. STATUS.md);
#   'kernels' — keep the fused kernels and their custom VJPs (appropriate on
#       directly-attached TPUs where the backward kernels compile normally);
#   'error' — raise, for deployments that must never silently change paths.
autodiff_policy = 'fallback'


def under_autodiff(*arrays) -> bool:
    """Best-effort detection of a Python-level autodiff trace.

    True when any argument is (or wraps) a JVP tracer, i.e. the caller is
    being traced by ``jax.grad``/``jax.vjp``/``jax.jvp`` — including under an
    outer ``jit`` or ``vmap``. Jaxpr-level transforms of an already-traced
    function (``grad(jit(f))``) do not re-run Python and are not detectable
    here; use ``use_kernels=False`` explicitly for those.
    """
    from jax._src.interpreters import ad  # LinearizeTracer isn't re-exported

    # jax.grad/vjp trace with LinearizeTracer (stackless JAX), jax.jvp with
    # JVPTracer; either means an autodiff transform is running this Python.
    ad_tracers = (ad.JVPTracer, ad.LinearizeTracer)
    pending = [a for a in arrays if isinstance(a, jax.core.Tracer)]
    visited = set()
    while pending:
        tracer = pending.pop()
        if id(tracer) in visited:
            continue
        visited.add(id(tracer))
        if isinstance(tracer, ad_tracers):
            return True
        for attr in ('primal', 'val'):
            inner = getattr(tracer, attr, None)
            if isinstance(inner, jax.core.Tracer):
                pending.append(inner)
    return False


def pick_batch_tile(B: int) -> int | None:
    """Batch (lane) tile for the fused kernels, or None if B is ineligible.

    Mosaic accepts a lane-dim block only when it is a multiple of 128 OR
    spans the whole array dimension, so the valid tiles are 256/128 for
    divisible batches and B itself (whole-dim block) for small batches.
    Sub-128 tiles of a larger batch (e.g. 16 of 48) LOWER-ERROR on real TPU
    even though interpret mode accepts them — do not reintroduce them.
    """
    if B % 256 == 0:
        return 256
    if B % 128 == 0:
        return 128
    if B <= 256 and B % 8 == 0:
        return B
    return None


def _shrink_tb(tb, block_floats_fn, limit_bytes: int = 11 * 2 ** 20):
    """Halve the batch tile while the kernel's VMEM footprint (double-
    buffered f32 blocks) exceeds the scoped limit. Large-F models (SMPL-X's
    pose feature is 504 wide) overflow the 16 MB scoped VMEM at tb=256 —
    measured: lbs_points needs 20.9 MB there."""
    while tb is not None and tb > 128 and 8 * block_floats_fn(tb) > limit_bytes:
        tb //= 2
    return tb


def kernel_batch_pad(B: int) -> int:
    """Padding that makes ``B`` kernel-eligible: up to a multiple of 8 in the
    whole-block regime (B <= 256), up to a multiple of 128 beyond it."""
    if B + ((-B) % 8) <= 256:
        return (-B) % 8
    return (-B) % 128


def kernel_mode(B: int) -> str | None:
    """'tpu' | 'interpret' | None — whether the fused kernels apply for batch B."""
    if _DISABLED or pick_batch_tile(B) is None:
        return None
    if FORCE_INTERPRET:
        return 'interpret'
    return 'tpu' if jax.default_backend() == 'tpu' else None


def to_vertex_major(x: jax.Array, v_pad: int | None = None,
                    perm=None) -> jax.Array:
    """(B, V, 3) -> (3, V[_pad], B) component-major relayout.

    By default NO lane padding is materialized: the kernels accept a
    non-VC-divisible vertex dim and mask the edge chunk in-VMEM, saving a
    full extra HBM pass over the (3, V, B) array. Pass ``v_pad`` to get the
    old zero-padded layout (static constants are still built padded).
    ``perm`` (a static index tuple/array) reorders the vertex axis during the
    same relayout — the chunk layout's vertex sort rides the one transpose
    the fit already pays (see ops/chunk_layout.py)."""
    xt = jnp.transpose(x, (2, 1, 0))
    if perm is not None:
        # Gather AFTER the transpose, one 2-D row-take per channel: on
        # (V, B) each gathered row is a contiguous (B,) strip (16 KB at
        # b4096). Measured at b4096: +1.7 ms over the bare transpose — the
        # cheapest XLA lowering of this permutation (a 3-D axis-1 take or a
        # pre-transpose take on 12-byte rows costs +2.3-2.6 ms and breaks
        # the centering+transpose fusion).
        idx = jnp.asarray(np.asarray(perm))
        xt = jnp.stack([
            c.at[idx].get(mode='promise_in_bounds', unique_indices=True)
            for c in xt
        ])
    if v_pad is None or v_pad == xt.shape[1]:
        return xt
    return jnp.pad(xt, ((0, 0), (0, v_pad - xt.shape[1]), (0, 0)))



def _runtime_omega(omega) -> bool:
    """True for a per-call (V, B) fit-weight operand. Runtime-weighted calls
    bypass the custom-VJP wrappers (whose backward passes assume the static
    (V_pad, 1) column): differentiating them raises JAX's non-differentiable
    pallas_call error instead of producing silently mis-weighted cotangents —
    autodiff traces are expected to take the XLA fallback per
    ``autodiff_policy``."""
    return omega is not None and omega.ndim == 2 and omega.shape[1] > 1


def _omega_spec(omega, tb):
    """BlockSpec for a per-vertex fit-weight operand: (V_pad, 1) static
    weights broadcast over lanes; (V, B) runtime weights tile like targets
    (the edge chunk is masked in-kernel alongside the targets')."""
    if omega.shape[1] == 1:
        return pl.BlockSpec((VC, 1), lambda i, k: (k, 0), memory_space=pltpu.VMEM)
    return pl.BlockSpec((VC, tb), lambda i, k: (k, i), memory_space=pltpu.VMEM)


def _mask_tail_rows(x, k, nchunks: int, rem: int):
    """Zero rows >= ``rem`` of the LAST vertex chunk (``rem`` = V % VC, 0 when
    divisible). Guards against arbitrary bit patterns (NaN/Inf) in the
    out-of-bounds region of a non-divisible edge block: the static operands
    have zero rows there, but garbage * 0 would still be NaN."""
    if rem == 0:
        return x
    lim = jnp.where(k == nchunks - 1, rem, x.shape[0])
    rows = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return jnp.where(rows < lim, x, 0.0)


def from_vertex_major(x_vm: jax.Array, num_vertices: int,
                      perm=None) -> jax.Array:
    """(3, V_pad, B) -> (B, V, 3). ``perm`` = the vertex order of ``x_vm``'s
    rows (the chunk layout's vperm); the output is returned in CANONICAL
    vertex order by applying its inverse."""
    if perm is not None:
        # Un-permute while rows are still contiguous (B,) strips (see
        # to_vertex_major), then transpose.
        inv = jnp.asarray(np.argsort(np.asarray(perm)))
        x_vm = jnp.stack(
            [jnp.take(c, inv, axis=0) for c in x_vm[:, :num_vertices]]
        )
    return jnp.transpose(x_vm[:, :num_vertices], (2, 1, 0))


def _blend_s6(starts_ref, k, nt: int):
    """Per-chunk K offset into the j-major packed joint operands: nt x the
    chunk's DFS range start. ``starts_ref`` is None in the degenerate
    (full-width) layout — the offset is then the static 0."""
    if starts_ref is None:
        return 0
    return pl.multiple_of(starts_ref[0, k] * nt, 8 * nt)


def _lbs_blend(pjp_ref, wtsp_ref, s6):
    """12 blended [R|t] entries, each (VC, TB): blend[a*4+c] = w @ pj[a*4+c].

    Operands are K-packed j-major (see :func:`_pack6_lhs_j`): the per-chunk
    packed weight columns wtsp (VC, 6·jr) pair with the rows
    [s6, s6 + 6·jr) of pjp (12, 6J, TB), so each blend is ONE MXU pass at
    K = 6·jr (a single K-tile when jr <= 21) at f32-emulation accuracy —
    instead of six passes at K=J each padded to a full K tile, or one pass
    at K = 6J spanning two tiles."""
    wp = wtsp_ref[:]
    k6 = wp.shape[1]
    return [_dot1(wp, pjp_ref[x, pl.ds(s6, k6), :], _MM) for x in range(12)]


def _lbs_homog(feat_ref, consts_ref):
    """First 3 homogeneous channels, each (VC, TB). The 4th channel is
    IDENTICALLY 1 by construction (posedirs' homogeneous row is zero, the
    template's is 1, the feature's constant entry is 1 — see
    models/shape_gram.py build_gram_data), so its dot is skipped; consumers
    use the blended translation directly."""
    return [_mm3(consts_ref[c], feat_ref[:]) for c in range(3)]


def _lbs_pos(pjp_ref, feat_ref, wtsp_ref, consts_ref, s6, blend=None,
             homog=None):
    """Shared extended-LBS chunk, all-2D: blended [R|t] applied to the
    homogeneous feature-projected template chunk.

    pjp_ref: (12, 6J, TB) K-packed per-joint [R|t], leading index = a*4 + c4.
    feat_ref: (F, TB). wtsp_ref: (VC, 6·jr) per-chunk K-packed weights.
    consts_ref: (4, VC, F). s6: chunk's K offset (see :func:`_blend_s6`).
    Returns [pos_x, pos_y, pos_z], each (VC, TB).
    """
    if blend is None:
        blend = _lbs_blend(pjp_ref, wtsp_ref, s6)
    if homog is None:
        homog = _lbs_homog(feat_ref, consts_ref)
    return [
        sum(blend[a * 4 + c] * homog[c] for c in range(3)) + blend[a * 4 + 3]
        for a in range(3)
    ]


def _rhs_kernel(nt, nchunks, rem, weighted, scale, subset, emit_homog, cached,
                *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    if cached:
        # Cached-homog variant: the posed template arrives as a per-vertex
        # input (see posed_template_lm) instead of being recomputed from the
        # (4, VC, F) constants — which large-F models re-stream per batch
        # tile (SMPL-X: ~2.6 GB/call at F=487, tb=128).
        tgt_ref, pjp_ref, hin_ref, wtsp_ref, wsub_ref, sd_ref = refs[:6]
        refs = refs[6:]
        feat_ref = consts_ref = None
    else:
        tgt_ref, pjp_ref, feat_ref, wtsp_ref, wsub_ref, consts_ref, sd_ref = refs[:7]
        refs = refs[7:]
        hin_ref = None
    om_ref = refs.pop(0) if weighted else None
    h_ref = refs.pop() if emit_homog else None
    r_ref, y_small_ref = refs[:2]
    rt_ref, yt_ref, sc_ref = refs[2:] if scale else (None, None, None)
    k = pl.program_id(1)
    s6 = _blend_s6(starts_ref, k, nt)
    st = 0 if starts_ref is None else pl.multiple_of(starts_ref[0, k], 8)
    jr = wsub_ref.shape[1]

    @pl.when(k == 0)
    def _():
        r_ref[:] = jnp.zeros_like(r_ref)
        y_small_ref[:] = jnp.zeros_like(y_small_ref)
        if scale:
            rt_ref[:] = jnp.zeros_like(rt_ref)
            yt_ref[:] = jnp.zeros_like(yt_ref)
            sc_ref[:] = jnp.zeros_like(sc_ref)

    blend = _lbs_blend(pjp_ref, wtsp_ref, s6)
    homog = (
        [hin_ref[c] for c in range(3)]
        if cached
        else _lbs_homog(feat_ref, consts_ref)
    )
    if emit_homog:
        # Cache the posed template for this iteration's recon kernel: it
        # reuses these channels (plus the solved-beta step) instead of
        # re-running the K=F homog dots (see recon_part_sums's cached path).
        for c in range(3):
            h_ref[c] = homog[c]
    pos = _lbs_pos(pjp_ref, feat_ref, wtsp_ref, consts_ref, s6, blend, homog)
    w = wsub_ref[:]  # (VC, jr) plain per-chunk weight columns
    t_vals = [_mask_tail_rows(tgt_ref[a], k, nchunks, rem) for a in range(3)]
    b = [t_vals[a] - pos[a] for a in range(3)]  # (VC, TB) residuals
    if weighted:
        # Per-vertex fit weights ride the residual: one exact f32 VPU multiply
        # makes every reduction below a weighted sum (r = Σ ω jacᵀb,
        # y = Σ ω w_vj b) while the LBS operands stay unweighted. ω is either
        # the static (VC, 1) column or a runtime (VC, TB) tile; the edge chunk
        # is masked like the targets' (runtime ω arrives unpadded).
        om = _mask_tail_rows(om_ref[:], k, nchunks, rem)
        b = [x * om for x in b]
    for a in range(3):
        # Parts-major (jr, TB) accumulated into the chunk's joint range of
        # the (jp, TB) output: jr rows instead of J on the MXU's output
        # sublanes, and J=24 on output LANES would have padded 24 -> 128.
        y_small_ref[a, pl.ds(st, jr), :] += _dot3(w, b[a], _C0_0)

    # The shape-Jacobian contraction folded in-kernel: r_e = Σ_v Σ_c
    # SD_v[c,e] (R̄_vᵀ b_v)_c, reusing the blends as R̄ columns. The joint-pair
    # moment formulation would emit a (TB, J·3·E) block instead — a K=VC dot
    # padded to 6 lane tiles that dominated this kernel.
    def jac_proj(field, out_ref):
        acc = None
        for c in range(3):
            g_c = sum(blend[a * 4 + c] * field[a] for a in range(3))  # (VC, TB)
            term = _dot3(sd_ref[c], g_c, _C0_0)  # (E, TB)
            acc = term if acc is None else acc + term
        out_ref[:] += acc

    jac_proj(b, r_ref)
    if scale:
        # Target-side moments for the scale column (the pos-side moments
        # follow by linearity: pos = tgt - b). Pad rows of the edge chunk are
        # masked in t_vals, and pos is identically 0 there (zero skinning
        # rows), so the second moments are exact. Under ω the scale moments
        # are ω-weighted like everything else (one VPU multiply on the
        # target / quadratic maps).
        mul = (lambda x: x * om) if weighted else (lambda x: x)
        tw = [mul(t_vals[a]) for a in range(3)]
        for a in range(3):
            yt_ref[a, pl.ds(st, jr), :] += _dot3(w, tw[a], _C0_0)
        jac_proj(tw, rt_ref)
        s_tt = mul(sum(t_vals[a] * t_vals[a] for a in range(3)))
        s_tp = mul(sum(t_vals[a] * pos[a] for a in range(3)))
        s_pp = mul(sum(pos[a] * pos[a] for a in range(3)))
        sc_ref[:] += jnp.concatenate(
            [
                jnp.sum(s_tt, axis=0, keepdims=True),
                jnp.sum(s_tp, axis=0, keepdims=True),
                jnp.sum(s_pp, axis=0, keepdims=True),
            ],
            axis=0,
        )


def _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                      omega=None, scale: bool = False,
                      interpret: bool = False, layout: BlendLayout | None = None,
                      emit_homog: bool = False, homog_vm=None):
    """Fused residual projection of the shape solve.

    Args:
        tgt_vm: (3, V, B) targets, component-major (V need not be a multiple
            of VC — the edge chunk is masked in-kernel).
        pj_cm: (12, J, B) per-joint [R|t] entries, leading index (a, c4).
        feat_cols: (F, B) homogeneous features (pose feature + constant 1).
        weights_pad: (V_pad, J) skinning weights (zero rows in padding).
        consts_pad: (4, V_pad, F) homogeneous template projector.
        sd_cm: (3, V_pad, E) shape directions, component-major.
        omega: optional per-vertex fit weights — (V_pad, 1) static (zero rows
            in padding) or (V, B) runtime (edge chunk masked in-kernel); when
            given every vertex sum below is ω-weighted.
        layout: per-chunk joint-subset blend layout (see :class:`BlendLayout`);
            None builds the degenerate full-width layout. With a real layout
            every per-vertex operand (targets, consts, sd, ω) must be in the
            layout's vertex order.
        homog_vm: optional PRECOMPUTED posed template (3, V_pad, B) (see
            :func:`posed_template_lm`). When given, ``feat_cols``/
            ``consts_pad`` are ignored (pass None) and the kernel reads the
            cached channels instead of re-computing the K=F homog dots —
            large-F models otherwise re-stream the (4, V_pad, F) constants
            once per batch tile. Mutually exclusive with ``emit_homog``.

    Returns:
        r (E, B) = Σ_v [ω_v] (R̄_v SD_v)ᵀ b_v (the rotation part of Σ jacᵀb)
        and y (3, J, B) = Σ_v [ω_v] w_vj b_v in CANONICAL joint order. With
        ``scale=True``, also the target-side scale-column moments
        rt (E, B) = Σ [ω] (R̄SD)ᵀ tgt, yt (3, J, B) = Σ [ω] w_vj tgt, and
        sc (3, B) = [Σ ω|tgt|², Σ ω tgt·pos, Σ ω|pos|²] (pos-side first
        moments follow by linearity: pos = tgt − b).
    """
    _, v_t, B = tgt_vm.shape
    v_pad = weights_pad.shape[0]
    E = sd_cm.shape[2]
    cached = homog_vm is not None
    assert not (cached and emit_homog)
    F = 0 if cached else feat_cols.shape[0]
    if layout is None:
        layout = default_layout(weights_pad, VC)
    jp, jr = layout.jp, layout.jr
    tb = _shrink_tb(
        pick_batch_tile(B),
        lambda t: (
            3 * VC + 12 * layout.nt * jp + F + E + 3 * jp
            + (3 * VC if (emit_homog or cached) else 0)
            # The cached variant's block budget is lean enough that the
            # in-kernel scratch (12 blend + 3 pos (VC, tb) temporaries)
            # becomes the binding term — measured: SMPL-X at tb=256
            # exceeded the 16 MB scoped limit by 40 KB without it.
            + (15 * VC if cached else 0)
            + ((E + 3 * jp + 3) if scale else 0)
            + (VC if omega is not None else 0)
        ) * t + VC * (layout.nt * jr + jr + 3 * F + 3 * E),
    )
    nchunks = v_pad // VC
    assert tb is not None and v_pad % VC == 0 and nchunks * VC >= v_t > (nchunks - 1) * VC
    grid = (B // tb, nchunks)
    pjp = pack_pj(pj_cm, layout)  # (12, 6*jp, B)
    weighted = omega is not None
    subset = not layout.full

    if cached:
        in_specs = [
            pl.BlockSpec((3, VC, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, layout.nt * jp, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, VC, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((VC, layout.nt * jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((VC, jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, VC, E), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
        ]
        operands = [tgt_vm, pjp, homog_vm, layout.wtsp_sub, layout.w_sub,
                    sd_cm]
    else:
        in_specs = [
            pl.BlockSpec((3, VC, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, layout.nt * jp, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((VC, layout.nt * jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((VC, jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, VC, F), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, VC, E), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
        ]
        operands = [tgt_vm, pjp, feat_cols, layout.wtsp_sub, layout.w_sub,
                    consts_pad, sd_cm]
    if subset:
        in_specs.insert(0, pl.BlockSpec(
            (1, nchunks), lambda i, k: (0, 0), memory_space=pltpu.SMEM))
        operands.insert(0, layout.starts)
    if weighted:
        in_specs.append(_omega_spec(omega, tb))
        operands.append(omega)

    out_specs = [
        pl.BlockSpec((E, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, jp, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((E, B), jnp.float32),
        jax.ShapeDtypeStruct((3, jp, B), jnp.float32),
    ]
    if scale:
        out_specs += [
            pl.BlockSpec((E, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, jp, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((E, B), jnp.float32),
            jax.ShapeDtypeStruct((3, jp, B), jnp.float32),
            jax.ShapeDtypeStruct((3, B), jnp.float32),
        ]
    if emit_homog:
        out_specs.append(pl.BlockSpec(
            (3, VC, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((3, v_pad, B), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_rhs_kernel, layout.nt, nchunks, v_t % VC, weighted, scale,
                          subset, emit_homog, cached),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    outs = list(outs) if isinstance(outs, (list, tuple)) else [outs]
    homog_out = outs.pop() if emit_homog else None
    if scale:
        r, y, rt, yt, sc = outs
        res = (r, unpermute_joints(y, layout), rt,
               unpermute_joints(yt, layout), sc)
    else:
        r, y = outs
        res = (r, unpermute_joints(y, layout))
    if emit_homog:
        return res + (homog_out,)
    return res


def _lbs_points_kernel(nt, subset, *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    pjp_ref, feat_ref, wtsp_ref, consts_ref, out_ref = refs
    s6 = _blend_s6(starts_ref, pl.program_id(1), nt)
    pos = _lbs_pos(pjp_ref, feat_ref, wtsp_ref, consts_ref, s6)
    for a in range(3):
        out_ref[a] = pos[a]


def _lbs_points_impl(pj_cm, feat_cols, weights_pad, consts_pad,
                     interpret: bool = False,
                     layout: BlendLayout | None = None):
    """Extended LBS -> per-vertex points, component-major (3, V_pad, B).

    With feat = [pose_feature; 1] this is the posed zero-beta mesh; appending
    the solved betas (and consts channels [shapedirs]) yields the reconstructed
    mesh pos + jac·x in the same single pass. With a real ``layout`` the
    output rows are in the layout's vertex order.
    """
    _, J, B = pj_cm.shape
    F = feat_cols.shape[0]
    v_pad = weights_pad.shape[0]
    if layout is None:
        layout = default_layout(weights_pad, VC)
    jp, jr = layout.jp, layout.jr
    tb = _shrink_tb(
        pick_batch_tile(B),
        lambda t: (12 * layout.nt * jp + F + 3 * VC) * t
        + VC * (layout.nt * jr + 3 * F),
    )
    assert tb is not None and v_pad % VC == 0
    nchunks = v_pad // VC
    grid = (B // tb, nchunks)
    pjp = pack_pj(pj_cm, layout)
    subset = not layout.full

    in_specs = [
        pl.BlockSpec((12, layout.nt * jp, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((F, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((VC, layout.nt * jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, VC, F), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
    ]
    operands = [pjp, feat_cols, layout.wtsp_sub, consts_pad]
    if subset:
        in_specs.insert(0, pl.BlockSpec(
            (1, nchunks), lambda i, k: (0, 0), memory_space=pltpu.SMEM))
        operands.insert(0, layout.starts)

    return pl.pallas_call(
        functools.partial(_lbs_points_kernel, layout.nt, subset),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, VC, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, v_pad, B), jnp.float32),
        interpret=interpret,
    )(*operands)


def _part_sums_kernel(nchunks, rem_t, rem_a, weighted, *refs):
    if weighted:
        t_ref, a_ref, pm_ref, om_ref, raw_ref, st_ref, sa_ref = refs
    else:
        t_ref, a_ref, pm_ref, raw_ref, st_ref, sa_ref = refs
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        raw_ref[:] = jnp.zeros_like(raw_ref)
        st_ref[:] = jnp.zeros_like(st_ref)
        sa_ref[:] = jnp.zeros_like(sa_ref)

    pm = pm_ref[:]  # (J, VC)
    # Sums are produced parts-major (J, TB): with J=24 on the output LANES the
    # MXU would pad 24 -> 128 (5.3x waste); as the output SUBLANE dim the pad
    # is 24 -> 32.
    contract = (((1,), (0,)), ((), ()))  # pm dim1 (VC) with points dim0 (VC)
    a_vals = [
        _mask_tail_rows(a_ref[d], k, nchunks, rem_a) for d in range(3)
    ]
    if weighted:
        # Fit weights: ω multiplies the reference side and the t-sum side
        # (the reference weighting convention), keeping pm binary so the
        # exact 2-pass membership dots stay exact. ω is the static (VC, 1)
        # column or a runtime (VC, TB) tile (edge chunk masked like targets).
        om = _mask_tail_rows(om_ref[:], k, nchunks, rem_t)
        a_vals = [a_d * om for a_d in a_vals]
    for c in range(3):
        t_c = _mask_tail_rows(t_ref[c], k, nchunks, rem_t)  # (VC, TB)
        st_in = t_c * om if weighted else t_c
        st_ref[c] += _dot2_exact_a(pm, st_in, contract)
        for d in range(3):
            a_d = a_vals[d]
            prod = (
                t_c * a_d
                if a_d.shape == t_c.shape
                else t_c * jnp.broadcast_to(a_d, t_c.shape)
            )
            raw_ref[c * 3 + d] += _dot2_exact_a(pm, prod, contract)
    for d in range(3):
        a_d = a_vals[d]
        if a_d.shape[1] != sa_ref.shape[2]:
            a_d = jnp.broadcast_to(a_d, (a_d.shape[0], sa_ref.shape[2]))
        sa_ref[d] += _dot2_exact_a(pm, a_d, contract)


@functools.partial(jax.jit, static_argnames=('interpret',))
def part_sums_vm(t_vm, a_vm, pm, omega=None, interpret: bool = False):
    """Per-part sums from component-major points.

    Args:
        t_vm: (3, V_pad, B) targets.
        a_vm: (3, V_pad, B) or (3, V_pad, 1) reference points.
        pm: (J, V_pad) part membership (zero columns for unused/pad vertices).
        omega: optional (V_pad, 1) static per-vertex fit weights; when given
            all sums are ω-weighted (reference convention: ω scales the
            reference side and the t-sum side).

    Returns:
        raw (B, J, 3, 3), s_t (B, J, 3), s_a (B_a, J, 3).
    """
    if omega is None:
        raw, st, sa = _part_sums_diff(t_vm, a_vm, pm, interpret)
    elif _runtime_omega(omega):
        raw, st, sa = _part_sums_impl(t_vm, a_vm, pm, omega=omega,
                                      interpret=interpret)
    else:
        raw, st, sa = _part_sums_w_diff(t_vm, a_vm, pm, omega, interpret)
    B = t_vm.shape[2]
    J = pm.shape[0]
    # raw is (9, J, B) with rows ordered (c, d); move batch to front, parts next.
    raw_b = jnp.transpose(raw, (2, 1, 0)).reshape(B, J, 3, 3)
    s_t = jnp.transpose(st, (2, 1, 0))
    s_a = jnp.transpose(sa, (2, 1, 0))
    return raw_b, s_t, s_a


@functools.partial(jax.jit, static_argnames=('interpret',))
def part_sums_vm_lm(t_vm, a_vm, pm, omega=None, interpret: bool = False):
    """Lane-major :func:`part_sums_vm`: returns the kernel-native layouts
    raw (9, J, B) with rows (c, d), s_t (3, J, B), s_a (3, J, B_a) — no
    transposes (the rotation fits consume these directly)."""
    if omega is None:
        return _part_sums_diff(t_vm, a_vm, pm, interpret)
    if _runtime_omega(omega):
        return _part_sums_impl(t_vm, a_vm, pm, omega=omega, interpret=interpret)
    return _part_sums_w_diff(t_vm, a_vm, pm, omega, interpret)


def _part_sums_impl(t_vm, a_vm, pm, omega=None, interpret: bool = False):
    _, v_t, B = t_vm.shape
    v_a = a_vm.shape[1]
    Ba = a_vm.shape[2]
    J = pm.shape[0]
    v_pad = pm.shape[1]
    tb = pick_batch_tile(B)
    nchunks = v_pad // VC
    assert tb is not None and v_pad % VC == 0 and Ba in (B, 1)
    assert nchunks * VC >= v_t > (nchunks - 1) * VC
    assert nchunks * VC >= v_a > (nchunks - 1) * VC
    grid = (B // tb, nchunks)
    weighted = omega is not None
    # Runtime (V, B) ω makes the ω-weighted reference sums batch-varying even
    # for a shared (B_a == 1) reference mesh.
    Ba_out = B if (Ba == B or (weighted and omega.shape[1] > 1)) else 1
    tba = tb if Ba == B else 1
    tba_out = tb if Ba_out == B else 1

    in_specs = [
        pl.BlockSpec((3, VC, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (3, VC, tba),
            (lambda i, k: (0, k, i)) if Ba == B else (lambda i, k: (0, k, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((J, VC), lambda i, k: (0, k), memory_space=pltpu.VMEM),
    ]
    operands = [t_vm, a_vm, pm]
    if weighted:
        in_specs.append(_omega_spec(omega, tb))
        operands.append(omega)

    raw, st, sa = pl.pallas_call(
        functools.partial(_part_sums_kernel, nchunks, v_t % VC, v_a % VC, weighted),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((9, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, J, tba_out),
                (lambda i, k: (0, 0, i)) if Ba_out == B else (lambda i, k: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, J, B), jnp.float32),
            jax.ShapeDtypeStruct((3, J, B), jnp.float32),
            jax.ShapeDtypeStruct((3, J, Ba_out), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return raw, st, sa


# ---------------------------------------------------------------------------
# Custom VJPs: backward passes as fused kernels of the same structure, making
# the fast path differentiable end-to-end (the forward outputs are linear in
# the traced inputs given the static constants, so each backward is again an
# extended-LBS-shaped reduction).
# ---------------------------------------------------------------------------


def _lbs_grads_chunk(g, pjp_ref, feat_ref, wtsp_ref, wfull_ref, consts_ref,
                     dpj_ref, dfeat_ref, k, s6):
    """Shared backward chunk: given per-vertex cotangent g (list of 3 (VC, TB)),
    accumulate dpj (12, tb, J) and dfeat (F, tb). The dpj dots use the full
    plain weights (their J axis lands on output LANES, which cannot take
    per-chunk dynamic offsets); the blends use the subset operands."""
    w = wfull_ref[:]  # (VC, J) plain full-width weights
    homog = _lbs_homog(feat_ref, consts_ref)

    @pl.when(k == 0)
    def _():
        dpj_ref[:] = jnp.zeros_like(dpj_ref)
        dfeat_ref[:] = jnp.zeros_like(dfeat_ref)

    for a in range(3):
        for c in range(4):
            prod = g[a] * homog[c] if c < 3 else g[a]  # (VC, TB); homog[3] == 1
            dpj_ref[a * 4 + c] += _dot3(
                prod, w, _C0_0
            )  # (TB, J)
    blend = _lbs_blend(pjp_ref, wtsp_ref, s6)
    for c in range(4):
        u_c = None
        for a in range(3):
            term = blend[a * 4 + c] * g[a]
            u_c = term if u_c is None else u_c + term
        dfeat_ref[:] += _dot3(
            consts_ref[c], u_c, _C0_0
        )  # (F, TB)


def _lbs_points_bwd_kernel(nt, subset, *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    (g_ref, pjp_ref, feat_ref, wtsp_ref, wfull_ref, consts_ref,
     dpj_ref, dfeat_ref) = refs
    k = pl.program_id(1)
    s6 = _blend_s6(starts_ref, k, nt)
    g = [g_ref[a] for a in range(3)]
    _lbs_grads_chunk(g, pjp_ref, feat_ref, wtsp_ref, wfull_ref, consts_ref,
                     dpj_ref, dfeat_ref, k, s6)


def _starts_spec(nchunks):
    return pl.BlockSpec((1, nchunks), lambda i, k: (0, 0),
                        memory_space=pltpu.SMEM)


def _bwd_vc(B: int, tb: int) -> int:
    """Vertex chunk for the backward kernels.

    Full VC when the batch grid is a single tile: with one batch tile Mosaic
    needs no second buffer for the batch-indexed blocks, and the kernel fits
    scoped VMEM. Any larger grid double-buffers the big (vc, tb) blocks on
    top of the in-kernel scratch — measured 19.6 MB (> the 16 MB limit) for
    the rhs backward at vc=256/tb=128 — so the chunk halves, which halves
    both the blocks and the scratch. This is what lets the grad recipe scan
    chunks LARGER than one batch tile (get_fit_grad_fn chunk 512/1024): at
    chunk 128 every kernel runs a single-tile grid at ~3x its large-batch
    cost per instance."""
    return VC if B <= tb else VC // 2


def _starts_at(layout: BlendLayout, vc: int):
    """``layout.starts`` re-granulated to ``vc``-row chunks: the layouts are
    built at VC-chunk granularity, and each VC-chunk's DFS joint-range start
    applies to all of its VC//vc sub-chunks."""
    if vc == VC:
        return layout.starts
    return jnp.repeat(layout.starts, VC // vc, axis=1)


def _bwd_common_specs(layout, tb, F, vc=VC):
    """The (pjp, feat, wtsp_sub, weights_pad, consts) spec block shared by
    the backward kernels."""
    jp_l, jr = layout.jp, layout.jr
    J = len(layout.jperm)
    return [
        pl.BlockSpec((12, layout.nt * jp_l, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((F, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((vc, layout.nt * jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((vc, J), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4, vc, F), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
    ]


def _lbs_points_bwd(pj_cm, feat_cols, weights_pad, consts_pad, g, interpret,
                    layout=None):
    _, J, B = pj_cm.shape
    F = feat_cols.shape[0]
    v_pad = weights_pad.shape[0]
    if layout is None:
        layout = default_layout(weights_pad, VC)
    tb = _shrink_tb(
        pick_batch_tile(B),
        lambda t: (
            6 * VC + 12 * layout.nt * layout.jp + 2 * F + 12 * J
        ) * t + VC * (layout.nt * layout.jr + J + 4 * F),
    )
    vc = _bwd_vc(B, tb)
    nchunks = v_pad // vc
    grid = (B // tb, nchunks)
    pjp = pack_pj(pj_cm, layout)
    subset = not layout.full

    in_specs = ([_starts_spec(nchunks)] if subset else []) + [
        pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
    ] + _bwd_common_specs(layout, tb, F, vc)
    operands = ([_starts_at(layout, vc)] if subset else []) + [
        g, pjp, feat_cols, layout.wtsp_sub, weights_pad, consts_pad]

    dpj, dfeat = pl.pallas_call(
        functools.partial(_lbs_points_bwd_kernel, layout.nt, subset),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((12, tb, J), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((12, B, J), jnp.float32),
            jax.ShapeDtypeStruct((F, B), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return jnp.transpose(dpj, (0, 2, 1)), dfeat


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _lbs_points_diff(pj_cm, feat_cols, weights_pad, consts_pad, interpret,
                     layout):
    return _lbs_points_impl(pj_cm, feat_cols, weights_pad, consts_pad,
                            interpret, layout=layout)


def _lbs_points_fwd(pj_cm, feat_cols, weights_pad, consts_pad, interpret,
                    layout):
    out = _lbs_points_impl(pj_cm, feat_cols, weights_pad, consts_pad,
                           interpret, layout=layout)
    return out, (pj_cm, feat_cols, weights_pad, consts_pad, layout)


def _lbs_points_bwd_rule(interpret, res, g):
    pj_cm, feat_cols, weights_pad, consts_pad, layout = res
    dpj, dfeat = _lbs_points_bwd(pj_cm, feat_cols, weights_pad, consts_pad,
                                 g, interpret, layout=layout)
    return (dpj, dfeat, jnp.zeros_like(weights_pad),
            jnp.zeros_like(consts_pad),
            jax.tree.map(jnp.zeros_like, layout))


_lbs_points_diff.defvjp(_lbs_points_fwd, _lbs_points_bwd_rule)


def _rhs_bwd_kernel(nt, nchunks, rem, weighted, subset, with_gh, *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    gh_ref = refs.pop(-4) if with_gh else None  # before the 3 outputs
    if weighted:
        (gr_ref, gy_ref, tgt_ref, pjp_ref, feat_ref, wtsp_ref, wfull_ref,
         consts_ref, sd_ref, om_ref, dtgt_ref, dpj_ref, dfeat_ref) = refs
    else:
        (gr_ref, gy_ref, tgt_ref, pjp_ref, feat_ref, wtsp_ref, wfull_ref,
         consts_ref, sd_ref, dtgt_ref, dpj_ref, dfeat_ref) = refs
    k = pl.program_id(1)
    s6 = _blend_s6(starts_ref, k, nt)
    w = wfull_ref[:]  # (VC, J) plain full-width weights
    homog = _lbs_homog(feat_ref, consts_ref)
    blend = _lbs_blend(pjp_ref, wtsp_ref, s6)
    pos = [
        sum(blend[a * 4 + c] * homog[c] for c in range(3)) + blend[a * 4 + 3]
        for a in range(3)
    ]
    b = [
        _mask_tail_rows(tgt_ref[a], k, nchunks, rem) - pos[a] for a in range(3)
    ]
    # Per-vertex spread of the r cotangent: G_c = SD_c @ gr, (VC, TB).
    G = [_mm3(sd_ref[c], gr_ref[:]) for c in range(3)]
    contract_j0 = (((1,), (0,)), ((), ()))  # wts (VC, J) dim1 with gy dim0 (J)
    db = []
    for a in range(3):
        db_a = _dot3(w, gy_ref[a], contract_j0)  # (VC, TB)
        for c in range(3):
            db_a += blend[a * 4 + c] * G[c]
        if weighted:
            # Forward residual was b_w = ω (t - pos): the ω factor lands on
            # every per-vertex cotangent (db is the cotangent w.r.t. b_w).
            db_a = db_a * om_ref[:]
        dtgt_ref[a] = db_a
        db.append(db_a)
    if weighted:
        b = [x * om_ref[:] for x in b]

    @pl.when(k == 0)
    def _():
        dpj_ref[:] = jnp.zeros_like(dpj_ref)
        dfeat_ref[:] = jnp.zeros_like(dfeat_ref)

    # blend enters twice: through pos (cotangent -db ⊙ homog) and, for the
    # rotation columns, through g_c = Σ_a blend_ac b_a (cotangent G_c ⊙ b_a).
    for a in range(3):
        for c in range(4):
            dblend = -db[a] * homog[c] if c < 3 else -db[a]  # homog[3] == 1
            if c < 3:
                dblend = dblend + G[c] * b[a]
            dpj_ref[a * 4 + c] += _dot3(dblend, w, _C0_0)  # (TB, J)
    for c in range(4):
        dh_c = -sum(blend[a * 4 + c] * db[a] for a in range(3))
        if with_gh and c < 3:
            # The emitted homog cache is an extra primal output (independent
            # of tgt/pj): its cotangent lands on feat through the same
            # consts contraction.
            dh_c = dh_c + gh_ref[c]
        dfeat_ref[:] += _dot3(consts_ref[c], dh_c, _C0_0)  # (F, TB)


def _rhs_moments_bwd(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                     gr, gy, gh=None, omega=None, interpret=False, layout=None):
    _, v_t, B = tgt_vm.shape
    v_pad = weights_pad.shape[0]
    J = weights_pad.shape[1]
    E = sd_cm.shape[2]
    F = feat_cols.shape[0]
    if layout is None:
        layout = default_layout(weights_pad, VC)
    tb = _shrink_tb(
        pick_batch_tile(B),
        lambda t: (
            9 * VC + 12 * layout.nt * layout.jp + 2 * F + E + 3 * J + 12 * J
        ) * t + VC * (layout.nt * layout.jr + J + 4 * F + 3 * E),
    )
    vc = _bwd_vc(B, tb)
    nchunks = v_pad // vc
    grid = (B // tb, nchunks)
    pjp = pack_pj(pj_cm, layout)
    weighted = omega is not None
    subset = not layout.full

    in_specs = ([_starts_spec(nchunks)] if subset else []) + [
        pl.BlockSpec((E, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
    ] + _bwd_common_specs(layout, tb, F, vc) + [
        pl.BlockSpec((3, vc, E), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
    ]
    operands = ([_starts_at(layout, vc)] if subset else []) + [
        gr, gy, tgt_vm, pjp, feat_cols, layout.wtsp_sub, weights_pad,
        consts_pad, sd_cm]
    if weighted:
        in_specs.append(
            pl.BlockSpec((vc, 1), lambda i, k: (k, 0), memory_space=pltpu.VMEM)
        )
        operands.append(omega)
    with_gh = gh is not None
    if with_gh:
        in_specs.append(pl.BlockSpec(
            (3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM))
        operands.append(gh)

    dtgt, dpj, dfeat = pl.pallas_call(
        functools.partial(_rhs_bwd_kernel, layout.nt, nchunks, v_t % vc, weighted, subset,
                          with_gh),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, J), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, v_t, B), jnp.float32),
            jax.ShapeDtypeStruct((12, B, J), jnp.float32),
            jax.ShapeDtypeStruct((F, B), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return dtgt, jnp.transpose(dpj, (0, 2, 1)), dfeat


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _rhs_moments_diff(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                      interpret, layout):
    return _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                             sd_cm, interpret=interpret, layout=layout)


def _rhs_moments_fwd(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                     interpret, layout):
    out = _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                            sd_cm, interpret=interpret, layout=layout)
    return out, (tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                 layout)


def _rhs_moments_bwd_rule(interpret, res, g):
    tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm, layout = res
    gr, gy = g
    dtgt, dpj, dfeat = _rhs_moments_bwd(
        tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm, gr, gy,
        interpret=interpret, layout=layout,
    )
    return (dtgt, dpj, dfeat, jnp.zeros_like(weights_pad),
            jnp.zeros_like(consts_pad), jnp.zeros_like(sd_cm),
            jax.tree.map(jnp.zeros_like, layout))


_rhs_moments_diff.defvjp(_rhs_moments_fwd, _rhs_moments_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _rhs_moments_w_diff(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                        sd_cm, omega, interpret, layout):
    return _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                             sd_cm, omega=omega, interpret=interpret,
                             layout=layout)


def _rhs_moments_w_fwd(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                       sd_cm, omega, interpret, layout):
    out = _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                            sd_cm, omega=omega, interpret=interpret,
                            layout=layout)
    return out, (tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                 omega, layout)


def _rhs_moments_w_bwd_rule(interpret, res, g):
    (tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm, omega,
     layout) = res
    gr, gy = g
    dtgt, dpj, dfeat = _rhs_moments_bwd(
        tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm, gr, gy,
        omega=omega, interpret=interpret, layout=layout,
    )
    return (dtgt, dpj, dfeat, jnp.zeros_like(weights_pad),
            jnp.zeros_like(consts_pad), jnp.zeros_like(sd_cm),
            jnp.zeros_like(omega), jax.tree.map(jnp.zeros_like, layout))


_rhs_moments_w_diff.defvjp(_rhs_moments_w_fwd, _rhs_moments_w_bwd_rule)


@functools.partial(jax.jit, static_argnames=('scale', 'interpret'))
def rhs_moments(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                omega=None, scale: bool = False, interpret: bool = False,
                layout: BlendLayout | None = None):
    """Differentiable fused residual projection (see _rhs_moments_impl).

    ``scale=True`` additionally returns the scale-column moments
    (rt, yt, sc) — that variant carries no custom VJP (scale solves follow
    ``autodiff_policy`` onto the XLA formulation under gradient traces)."""
    if layout is None:
        layout = default_layout(weights_pad, VC)
    if scale:
        return _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad,
                                 consts_pad, sd_cm, omega=omega, scale=True,
                                 interpret=interpret, layout=layout)
    if omega is None:
        return _rhs_moments_diff(tgt_vm, pj_cm, feat_cols, weights_pad,
                                 consts_pad, sd_cm, interpret, layout)
    if _runtime_omega(omega):
        return _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad,
                                 consts_pad, sd_cm, omega=omega,
                                 interpret=interpret, layout=layout)
    return _rhs_moments_w_diff(tgt_vm, pj_cm, feat_cols, weights_pad,
                               consts_pad, sd_cm, omega, interpret, layout)


@functools.partial(jax.jit, static_argnames=('interpret',))
def lbs_points(pj_cm, feat_cols, weights_pad, consts_pad,
               interpret: bool = False, layout: BlendLayout | None = None):
    """Differentiable extended LBS -> per-vertex points (see _lbs_points_impl).
    With a real ``layout`` the output vertex rows are in the layout's order."""
    if layout is None:
        layout = default_layout(weights_pad, VC)
    return _lbs_points_diff(pj_cm, feat_cols, weights_pad, consts_pad,
                            interpret, layout)


def _recon_part_sums_kernel(nt, nchunks, rem, weighted, subset, *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    if weighted:
        (tgt_ref, pjp_ref, feat_ref, wtsp_ref, consts_ref, pm_ref, om_ref,
         raw_ref, st_ref, sa_ref) = refs
    else:
        (tgt_ref, pjp_ref, feat_ref, wtsp_ref, consts_ref, pm_ref,
         raw_ref, st_ref, sa_ref) = refs
    k = pl.program_id(1)
    s6 = _blend_s6(starts_ref, k, nt)

    @pl.when(k == 0)
    def _():
        raw_ref[:] = jnp.zeros_like(raw_ref)
        st_ref[:] = jnp.zeros_like(st_ref)
        sa_ref[:] = jnp.zeros_like(sa_ref)

    # The reconstructed reference mesh (extended LBS of the just-solved betas)
    # lives only in VMEM: the part sums consume it chunk by chunk, so the
    # (3, V_pad, B) recon never exists in HBM between the shape solve and the
    # rotation fit.
    pos = _lbs_pos(pjp_ref, feat_ref, wtsp_ref, consts_ref, s6)
    pm = pm_ref[:]  # (J, VC)
    contract = (((1,), (0,)), ((), ()))  # pm dim1 (VC) with points dim0 (VC)
    if weighted:
        om = _mask_tail_rows(om_ref[:], k, nchunks, rem)  # (VC, 1|TB)
        pos = [p * om for p in pos]
    for c in range(3):
        t_c = _mask_tail_rows(tgt_ref[c], k, nchunks, rem)  # (VC, TB)
        st_in = t_c * om if weighted else t_c
        st_ref[c] += _dot2_exact_a(pm, st_in, contract)
        for d in range(3):
            raw_ref[c * 3 + d] += _dot2_exact_a(pm, t_c * pos[d], contract)
    for d in range(3):
        sa_ref[d] += _dot2_exact_a(pm, pos[d], contract)


def _recon_part_sums_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm,
                          omega=None, interpret: bool = False,
                          layout: BlendLayout | None = None):
    _, v_t, B = tgt_vm.shape
    v_pad = weights_pad.shape[0]
    J = pm.shape[0]
    F = feat_cols.shape[0]
    if layout is None:
        layout = default_layout(weights_pad, VC)
    jp_l, jr = layout.jp, layout.jr
    tb = _shrink_tb(
        pick_batch_tile(B),
        lambda t: (3 * VC + 12 * layout.nt * jp_l + F + 15 * J) * t
        + VC * (layout.nt * jr + 3 * F + J),
    )
    nchunks = v_pad // VC
    assert tb is not None and v_pad % VC == 0
    assert nchunks * VC >= v_t > (nchunks - 1) * VC
    grid = (B // tb, nchunks)
    pjp = pack_pj(pj_cm, layout)
    weighted = omega is not None
    subset = not layout.full

    in_specs = [
        pl.BlockSpec((3, VC, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((12, layout.nt * jp_l, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((F, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((VC, layout.nt * jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, VC, F), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((J, VC), lambda i, k: (0, k), memory_space=pltpu.VMEM),
    ]
    operands = [tgt_vm, pjp, feat_cols, layout.wtsp_sub, consts_pad, pm]
    if subset:
        in_specs.insert(0, pl.BlockSpec(
            (1, nchunks), lambda i, k: (0, 0), memory_space=pltpu.SMEM))
        operands.insert(0, layout.starts)
    if weighted:
        in_specs.append(_omega_spec(omega, tb))
        operands.append(omega)

    return pl.pallas_call(
        functools.partial(_recon_part_sums_kernel, layout.nt, nchunks, v_t % VC, weighted,
                          subset),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((9, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, J, B), jnp.float32),
            jax.ShapeDtypeStruct((3, J, B), jnp.float32),
            jax.ShapeDtypeStruct((3, J, B), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def _recon_part_sums_bwd_kernel(nt, nchunks, rem, weighted, subset, *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    if weighted:
        (tgt_ref, pjp_ref, feat_ref, wtsp_ref, wfull_ref, consts_ref, pm_ref,
         om_ref, graw_ref, gst_ref, gsa_ref, dtgt_ref, dpj_ref,
         dfeat_ref) = refs
    else:
        (tgt_ref, pjp_ref, feat_ref, wtsp_ref, wfull_ref, consts_ref, pm_ref,
         graw_ref, gst_ref, gsa_ref, dtgt_ref, dpj_ref, dfeat_ref) = refs
    k = pl.program_id(1)
    s6 = _blend_s6(starts_ref, k, nt)
    pm = pm_ref[:]  # (J, VC)
    contract_j = (((0,), (0,)), ((), ()))  # pm dim0 (J) with grad dim0 (J)
    pos = _lbs_pos(pjp_ref, feat_ref, wtsp_ref, consts_ref, s6)
    W = [_dot2_exact_a(pm, graw_ref[x], contract_j) for x in range(9)]  # (VC, TB)
    om = om_ref[:] if weighted else None  # (VC, 1)
    for c in range(3):
        acc = _dot2_exact_a(pm, gst_ref[c], contract_j)
        for d in range(3):
            acc += W[c * 3 + d] * pos[d]
        # Forward sums carried ω on the recon side and the t-sum side: the t
        # cotangent picks up one ω factor per vertex.
        dtgt_ref[c] = acc * om if weighted else acc
    dpos = []
    tgt = [_mask_tail_rows(tgt_ref[c], k, nchunks, rem) for c in range(3)]
    for d in range(3):
        acc = _dot2_exact_a(pm, gsa_ref[d], contract_j)
        for c in range(3):
            acc += W[c * 3 + d] * tgt[c]
        dpos.append(acc * om if weighted else acc)
    _lbs_grads_chunk(dpos, pjp_ref, feat_ref, wtsp_ref, wfull_ref, consts_ref,
                     dpj_ref, dfeat_ref, k, s6)


def _recon_part_sums_bwd(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm,
                         graw, gst, gsa, omega=None, interpret=False,
                         layout=None):
    _, v_t, B = tgt_vm.shape
    v_pad = weights_pad.shape[0]
    J = pm.shape[0]
    Jw = weights_pad.shape[1]
    F = feat_cols.shape[0]
    if layout is None:
        layout = default_layout(weights_pad, VC)
    tb = _shrink_tb(
        pick_batch_tile(B),
        lambda t: (
            6 * VC + 12 * layout.nt * layout.jp + 2 * F + 15 * J + 12 * Jw
        ) * t + VC * (layout.nt * layout.jr + Jw + 4 * F + J),
    )
    vc = _bwd_vc(B, tb)
    nchunks = v_pad // vc
    grid = (B // tb, nchunks)
    pjp = pack_pj(pj_cm, layout)
    weighted = omega is not None
    subset = not layout.full

    in_specs = ([_starts_spec(nchunks)] if subset else []) + [
        pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
    ] + _bwd_common_specs(layout, tb, F, vc) + [
        pl.BlockSpec((J, vc), lambda i, k: (0, k), memory_space=pltpu.VMEM),
    ]
    operands = ([_starts_at(layout, vc)] if subset else []) + [
        tgt_vm, pjp, feat_cols, layout.wtsp_sub, weights_pad, consts_pad, pm]
    if weighted:
        in_specs.append(
            pl.BlockSpec((vc, 1), lambda i, k: (k, 0), memory_space=pltpu.VMEM)
        )
        operands.append(omega)
    in_specs += [
        pl.BlockSpec((9, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
    ]
    operands += [graw, gst, gsa]

    dtgt, dpj, dfeat = pl.pallas_call(
        functools.partial(_recon_part_sums_bwd_kernel, layout.nt, nchunks, v_t % vc,
                          weighted, subset),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, weights_pad.shape[1]), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, v_t, B), jnp.float32),
            jax.ShapeDtypeStruct((12, B, weights_pad.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((F, B), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return dtgt, jnp.transpose(dpj, (0, 2, 1)), dfeat


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _recon_part_sums_diff(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm,
                          interpret, layout):
    return _recon_part_sums_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                                 pm, interpret=interpret, layout=layout)


def _recon_part_sums_fwd(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm,
                         interpret, layout):
    out = _recon_part_sums_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                                pm, interpret=interpret, layout=layout)
    return out, (tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm, layout)


def _recon_part_sums_bwd_rule(interpret, res, g):
    tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm, layout = res
    graw, gst, gsa = g
    dtgt, dpj, dfeat = _recon_part_sums_bwd(
        tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm, graw, gst, gsa,
        interpret=interpret, layout=layout,
    )
    return (dtgt, dpj, dfeat, jnp.zeros_like(weights_pad),
            jnp.zeros_like(consts_pad), jnp.zeros_like(pm),
            jax.tree.map(jnp.zeros_like, layout))


_recon_part_sums_diff.defvjp(_recon_part_sums_fwd, _recon_part_sums_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _recon_part_sums_w_diff(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                            pm, omega, interpret, layout):
    return _recon_part_sums_impl(tgt_vm, pj_cm, feat_cols, weights_pad,
                                 consts_pad, pm, omega=omega,
                                 interpret=interpret, layout=layout)


def _recon_part_sums_w_fwd(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                           pm, omega, interpret, layout):
    out = _recon_part_sums_impl(tgt_vm, pj_cm, feat_cols, weights_pad,
                                consts_pad, pm, omega=omega,
                                interpret=interpret, layout=layout)
    return out, (tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm, omega,
                 layout)


def _recon_part_sums_w_bwd_rule(interpret, res, g):
    (tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm, omega,
     layout) = res
    graw, gst, gsa = g
    dtgt, dpj, dfeat = _recon_part_sums_bwd(
        tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm, graw, gst, gsa,
        omega=omega, interpret=interpret, layout=layout,
    )
    return (dtgt, dpj, dfeat, jnp.zeros_like(weights_pad),
            jnp.zeros_like(consts_pad), jnp.zeros_like(pm),
            jnp.zeros_like(omega), jax.tree.map(jnp.zeros_like, layout))


_recon_part_sums_w_diff.defvjp(_recon_part_sums_w_fwd, _recon_part_sums_w_bwd_rule)


@functools.partial(jax.jit, static_argnames=('interpret',))
def recon_part_sums(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm,
                    omega=None, interpret: bool = False,
                    layout: BlendLayout | None = None):
    """Fused reconstruction + per-part sums: extended LBS of the solved betas
    feeds the part-sum reductions in VMEM, so the reference mesh never reaches
    HBM. Returns raw (B, J, 3, 3), s_t (B, J, 3), s_a (B, J, 3) exactly like
    :func:`part_sums_vm` with a batched reference."""
    raw, st, sa = recon_part_sums_lm(
        tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm, omega=omega,
        interpret=interpret, layout=layout,
    )
    B = tgt_vm.shape[2]
    J = pm.shape[0]
    raw_b = jnp.transpose(raw, (2, 1, 0)).reshape(B, J, 3, 3)
    s_t = jnp.transpose(st, (2, 1, 0))
    s_a = jnp.transpose(sa, (2, 1, 0))
    return raw_b, s_t, s_a


@functools.partial(jax.jit, static_argnames=('interpret',))
def recon_part_sums_lm(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm,
                       omega=None, interpret: bool = False,
                       layout: BlendLayout | None = None):
    """Lane-major :func:`recon_part_sums`: kernel-native raw (9, J, B) rows
    (c, d), s_t (3, J, B), s_a (3, J, B)."""
    if layout is None:
        layout = default_layout(weights_pad, VC)
    if omega is None:
        return _recon_part_sums_diff(
            tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm, interpret,
            layout,
        )
    if _runtime_omega(omega):
        return _recon_part_sums_impl(
            tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm,
            omega=omega, interpret=interpret, layout=layout,
        )
    return _recon_part_sums_w_diff(
        tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, pm, omega,
        interpret, layout,
    )


def _part_sums_bwd_kernel(nchunks, rem_t, rem_a, t_ref, a_ref, pm_ref,
                          graw_ref, gst_ref, gsa_ref, dt_ref, da_ref):
    # Grid is (V_chunks, B_tiles) with batch innermost: the unbatched-reference
    # da block (indexed by chunk only) then accumulates over consecutive steps.
    i = pl.program_id(1)
    k = pl.program_id(0)
    tb = t_ref.shape[2]
    a_batched = a_ref.shape[2] == tb
    pm = pm_ref[:]  # (J, VC)
    contract_j = (((0,), (0,)), ((), ()))  # pm dim0 (J) with grad dim0 (J)

    # W[c*3+d] = pm^T graw_cd -> (VC, TB): per-vertex spread of part grads.
    W = [
        _dot2_exact_a(pm, graw_ref[x], contract_j)
        for x in range(9)
    ]  # each (VC, TB)
    t = [_mask_tail_rows(t_ref[c], k, nchunks, rem_t) for c in range(3)]
    a_raw = [_mask_tail_rows(a_ref[d], k, nchunks, rem_a) for d in range(3)]
    a = (
        a_raw
        if a_batched
        else [jnp.broadcast_to(x, (x.shape[0], tb)) for x in a_raw]
    )

    for c in range(3):
        acc = _dot2_exact_a(pm, gst_ref[c], contract_j)
        for d in range(3):
            acc += W[c * 3 + d] * a[d]
        dt_ref[c] = acc

    if a_batched:
        for d in range(3):
            acc = _dot2_exact_a(pm, gsa_ref[d], contract_j)
            for c in range(3):
                acc += W[c * 3 + d] * t[c]
            da_ref[d] = acc
    else:
        @pl.when(i == 0)
        def _():
            for d in range(3):
                da_ref[d] = _dot2_exact_a(pm, gsa_ref[d], contract_j
                )
        for d in range(3):
            acc = None
            for c in range(3):
                term = W[c * 3 + d] * t[c]
                acc = term if acc is None else acc + term
            da_ref[d] += jnp.sum(acc, axis=1, keepdims=True)


def _part_sums_bwd(t_vm, a_vm, pm, graw, gst, gsa, interpret):
    _, v_t, B = t_vm.shape
    v_a = a_vm.shape[1]
    Ba = a_vm.shape[2]
    J = pm.shape[0]
    v_pad = pm.shape[1]
    tb = pick_batch_tile(B)
    nchunks = v_pad // VC
    grid = (nchunks, B // tb)
    tba = tb if Ba == B else 1

    dt, da = pl.pallas_call(
        functools.partial(_part_sums_bwd_kernel, nchunks, v_t % VC, v_a % VC),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, VC, tb), lambda k, i: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, VC, tba),
                (lambda k, i: (0, k, i)) if Ba == B else (lambda k, i: (0, k, 0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((J, VC), lambda k, i: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, J, tb), lambda k, i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, tb), lambda k, i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, J, tba),
                (lambda k, i: (0, 0, i)) if Ba == B else (lambda k, i: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((3, VC, tb), lambda k, i: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, VC, tba),
                (lambda k, i: (0, k, i)) if Ba == B else (lambda k, i: (0, k, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, v_t, B), jnp.float32),
            jax.ShapeDtypeStruct((3, v_a, Ba), jnp.float32),
        ],
        interpret=interpret,
    )(t_vm, a_vm, pm, graw, gst, gsa)
    return dt, da


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _part_sums_diff(t_vm, a_vm, pm, interpret):
    return _part_sums_impl(t_vm, a_vm, pm, interpret=interpret)


def _part_sums_fwd(t_vm, a_vm, pm, interpret):
    return _part_sums_impl(t_vm, a_vm, pm, interpret=interpret), (t_vm, a_vm, pm)


def _part_sums_bwd_rule(interpret, res, g):
    t_vm, a_vm, pm = res
    graw, gst, gsa = g
    dt, da = _part_sums_bwd(t_vm, a_vm, pm, graw, gst, gsa, interpret)
    return dt, da, jnp.zeros_like(pm)


_part_sums_diff.defvjp(_part_sums_fwd, _part_sums_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _part_sums_w_diff(t_vm, a_vm, pm, omega, interpret):
    return _part_sums_impl(t_vm, a_vm, pm, omega=omega, interpret=interpret)


def _part_sums_w_fwd(t_vm, a_vm, pm, omega, interpret):
    out = _part_sums_impl(t_vm, a_vm, pm, omega=omega, interpret=interpret)
    return out, (t_vm, a_vm, pm, omega)


def _part_sums_w_bwd_rule(interpret, res, g):
    # The weighted sums are the unweighted ones with ω ⊙ (reference side,
    # t-sum side); both input cotangents therefore pick up one ω factor:
    # dt = ω ⊙ dt₀, da = ω ⊙ da₀ (ω is static, no tangent).
    t_vm, a_vm, pm, omega = res
    graw, gst, gsa = g
    dt, da = _part_sums_bwd(t_vm, a_vm, pm, graw, gst, gsa, interpret)
    v_t = dt.shape[1]
    v_a = da.shape[1]
    dt = dt * omega[None, :v_t, :]
    da = da * omega[None, :v_a, :]
    return dt, da, jnp.zeros_like(pm), jnp.zeros_like(omega)


_part_sums_w_diff.defvjp(_part_sums_w_fwd, _part_sums_w_bwd_rule)


# ---------------------------------------------------------------------------
# Gramian-assembly kernel: the shape solve's per-instance quadratic forms
# (term1 = X:Ksd, sym(Z^T T), (qT)^T T, the joints block, SA, rhs moments)
# computed per batch tile with batch in lanes. Replaces ~1.3 ms/iteration of
# XLA relayout-heavy glue (copies/reshapes around (B, 3J, 3J) intermediates)
# with a few MXU dots and sublane reductions. Semantics identical to the XLA
# assembly in models/shape_gram.py (which remains the fallback and the
# backward implementation).
# ---------------------------------------------------------------------------


def _gram_kernel(has_joints, E, J, r_ref, t_ref, y_ref, p_ref, bj_ref,
                 ksd_ref, lz_ref, sd1_ref, q_ref, w1_ref,
                 g_ref, sa_ref, rb_ref, sb_ref):
    TB = r_ref.shape[2]
    J3 = r_ref.shape[1]
    R = [r_ref[a] for a in range(3)]  # (J3, TB)
    T3 = [t_ref[a].reshape(E, J, TB) for a in range(3)]
    P3 = [p_ref[a].reshape(E, J, TB) for a in range(3)] if has_joints else None

    # term1 = Ksd : X with X[(jc),(kd)] = sum_a R_a[jc] R_a[kd] (VMEM-only).
    X = None
    for a in range(3):
        Xa = (R[a][:, None, :] * R[a][None, :, :]).reshape(J3 * J3, TB)
        X = Xa if X is None else X + Xa
    G = _dot3(ksd_ref[:], X, _C0_0)  # (E*E, TB)

    # Z rows (e, j): Z_a = Lz^T R_a.
    Z3 = [_dot3(lz_ref[:], R[a], _C0_0).reshape(E, J, TB) for a in range(3)]
    w1 = w1_ref[:]  # (J, 1)
    q_t = (((1,), (0,)), ((), ()))  # q dim1 (k) with T dim0 (k)

    m1_rows, m2_rows, m3_rows = [], [], []
    for e in range(E):
        acc1 = acc2 = acc3 = None
        for a in range(3):
            row1 = (T3[a] * Z3[a][e][None]).sum(axis=1)  # (E, TB): M1[e, :]
            q_ae = _dot3(q_ref[:], T3[a][e], q_t)  # (J, TB)
            row2 = (T3[a] * q_ae[None]).sum(axis=1)
            acc1 = row1 if acc1 is None else acc1 + row1
            acc2 = row2 if acc2 is None else acc2 + row2
            if has_joints:
                row3 = (P3[a] * P3[a][e][None]).sum(axis=1)
                acc3 = row3 if acc3 is None else acc3 + row3
        m1_rows.append(acc1)
        m2_rows.append(acc2)
        if has_joints:
            m3_rows.append(acc3)
    M1 = jnp.concatenate(m1_rows, axis=0)  # (E*E, TB), rows (e, f)
    M1T = M1.reshape(E, E, TB).transpose(1, 0, 2).reshape(E * E, TB)
    G = G + M1 + M1T + jnp.concatenate(m2_rows, axis=0)
    if has_joints:
        G = G + jnp.concatenate(m3_rows, axis=0)
    g_ref[:] = G

    sa_blocks = []
    rb = None
    sb_rows = []
    for a in range(3):
        s = _dot3(sd1_ref[:], R[a], _C0_0)  # (E, TB)
        s = s + (T3[a] * w1[None]).sum(axis=1)
        y_a = y_ref[a]  # (J, TB)
        term = (T3[a] * y_a[None]).sum(axis=1)  # (E, TB)
        sb_a = y_a.sum(axis=0, keepdims=True)  # (1, TB)
        if has_joints:
            s = s + P3[a].sum(axis=1)
            term = term + (P3[a] * bj_ref[a][None]).sum(axis=1)
            sb_a = sb_a + bj_ref[a].sum(axis=0, keepdims=True)
        sa_blocks.append(s)
        rb = term if rb is None else rb + term
        sb_rows.append(sb_a)
    sa_ref[:] = jnp.concatenate(sa_blocks, axis=0)  # (3E, TB)
    rb_ref[:] = rb
    sb_ref[:] = jnp.concatenate(sb_rows, axis=0)  # (3, TB)


def _term1_kernel(nxb, rblk_ref, r_ref, ksd_ref, g_ref):
    """Blocked term1 = Ksd : X with X[(jc),(kd)] = Σ_a R_a[jc] R_a[kd].

    For large models (SMPL-X J3=165) both the full in-kernel X buffer
    (J3² rows) and the whole Ksd operand exceed scoped VMEM, and the full
    fused gram kernel's unrolled E-loops overwhelm the Mosaic compiler —
    so term1 streams Ksd in (xb·J3, E²) row slices over a second grid axis
    with this minimal body, and the remaining (small) Gramian pieces stay
    in XLA (see :func:`_gram_mparts_ref`)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)

    J3 = r_ref.shape[1]
    xb = rblk_ref.shape[1]
    TB = r_ref.shape[2]
    X = None
    for a in range(3):
        Xa = (rblk_ref[a][:, None, :] * r_ref[a][None, :, :]).reshape(
            xb * J3, TB)
        X = Xa if X is None else X + Xa
    g_ref[:] += _dot3(ksd_ref[:], X, _C0_0)  # (E*E, TB)


def _gram_tile(B: int) -> int:
    """Gram-assembly batch tile: capped at 128 (the in-kernel X buffer is
    (J3², tb)); small batches use the whole-dim block (Mosaic accepts a lane
    block only when it is a multiple of 128 or spans the array)."""
    if B % 128 == 0:
        return 128
    if B <= 256 and B % 8 == 0:
        return B
    raise ValueError(f'batch {B} is not kernel-eligible (pick_batch_tile)')


def _gram_xblock(J3: int, E: int) -> int | None:
    """X-row block for the streamed term1 kernel, or None when the whole
    Ksd fits the single-pass fused kernel (≤ ~2.75 MB — SMPL's 2.51 MB
    whole-Ksd layout stays as is). When streaming, the largest sublane-legal
    (multiple-of-8) divisor of the 8-padded row count J3p whose Ksd slice
    (xb·J3, E²) stays within ~1.5 MB: SMPL-X (J3=165 → J3p=168, E=16)
    streams at xb=8 (21 steps)."""
    if J3 * J3 * E * E * 4 <= 2.75 * 2 ** 20:
        return None
    J3p = -(-J3 // 8) * 8
    budget = int(1.5 * 2 ** 20 / (J3 * E * E * 4))
    best = 8
    for xb in range(8, J3p, 8):
        if J3p % xb == 0 and xb <= budget:
            best = xb
    return best


def _term1_blocked(R_cm, ksd, E: int, tb: int, xb: int, interpret: bool):
    """(E*E, B) term1 via the streamed-Ksd kernel (see _term1_kernel)."""
    _, J3, B = R_cm.shape
    J3p = -(-J3 // 8) * 8
    nxb = J3p // xb
    if J3p != J3:
        # Zero rows at r >= J3 keep both the X blocks and the streamed Ksd
        # slices exact (cheap: an 8 MB / 28 MB append at SMPL-X shapes).
        R_blk = jnp.pad(R_cm, ((0, 0), (0, J3p - J3), (0, 0)))
        ksd = jnp.pad(ksd, ((0, (J3p - J3) * J3), (0, 0)))
    else:
        R_blk = R_cm
    return pl.pallas_call(
        functools.partial(_term1_kernel, nxb),
        grid=(B // tb, nxb),
        in_specs=[
            pl.BlockSpec((3, xb, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J3, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((xb * J3, E * E), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E * E, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E * E, B), jnp.float32),
        interpret=interpret,
    )(R_blk, R_cm, ksd)


def _gram_mparts_ref(R_cm, T_cm, y_cm, P_cm, bJ_cm, lz, sd1_2d, q, w1,
                     has_joints: bool):
    """XLA statement of every Gramian piece EXCEPT term1 (the X:Ksd part).

    These all live in (B, ~E·J) tensors — cheap at any J. Only term1's
    (B, 3J, 3J) X intermediate is pathological at large J (446 MB at
    SMPL-X b4096), which the streamed kernel replaces.

    Precision: HIGH (bf16_3x — measured ~1.4e-5 rel on this TPU), the same
    emulation class as the kernels' 3-pass dots; HIGHEST (6-pass) doubled
    this path's MXU time for accuracy the moments don't need."""
    _, J3, B = R_cm.shape
    E = sd1_2d.shape[1]
    hi = jax.lax.Precision.HIGH
    T3 = T_cm.reshape(3, E, -1, B)
    Z3 = jnp.einsum('jx,ajb->axb', lz, R_cm, precision=hi).reshape(3, E, -1, B)
    M1 = jnp.einsum('aejb,afjb->efb', Z3, T3, precision=hi)
    Q3 = jnp.einsum('jk,aekb->aejb', q, T3, precision=hi)
    M2 = jnp.einsum('aejb,afjb->efb', Q3, T3, precision=hi)
    G = (M1 + jnp.swapaxes(M1, 0, 1) + M2).reshape(E * E, B)
    SA = jnp.einsum('je,ajb->aeb', sd1_2d, R_cm, precision=hi) + jnp.einsum(
        'j,aejb->aeb', w1[:, 0], T3, precision=hi
    )
    rb = jnp.einsum('aejb,ajb->eb', T3, y_cm, precision=hi)
    Sb = jnp.sum(y_cm, axis=1)  # (3, B)
    if has_joints:
        P3 = P_cm.reshape(3, E, -1, B)
        G = G + jnp.einsum('aejb,afjb->efb', P3, P3, precision=hi).reshape(E * E, B)
        SA = SA + jnp.sum(P3, axis=2)
        rb = rb + jnp.einsum('aejb,ajb->eb', P3, bJ_cm, precision=hi)
        Sb = Sb + jnp.sum(bJ_cm, axis=1)
    return G, SA.reshape(3 * E, B), rb, Sb


def _gram_assembly_impl(R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d, q, w1,
                        has_joints: bool, interpret: bool):
    _, J3, B = R_cm.shape
    E = sd1_2d.shape[1]
    J = y_cm.shape[1]
    EJ = T_cm.shape[1]
    PJ = P_cm.shape[1]
    tb = _gram_tile(B)
    xb = _gram_xblock(J3, E)
    if xb is not None:
        # Large-J hybrid: streamed term1 kernel + XLA M-parts. The fused
        # kernel below cannot hold X/Ksd in VMEM at these shapes, and its
        # unrolled E-loops overwhelm the Mosaic compiler. The streamed
        # kernel's VMEM is slim (X block + one Ksd slice), so it takes the
        # 256 batch tile — halving how often the ~28 MB Ksd operand streams
        # (once per batch tile).
        tb1 = 256 if B % 256 == 0 else tb
        G1 = _term1_blocked(R_cm, ksd, E, tb1, xb, interpret)
        G2, SA, rb, Sb = _gram_mparts_ref(
            R_cm, T_cm, y_cm, P_cm, bJ_cm, lz, sd1_2d, q, w1, has_joints
        )
        return G1 + G2, SA, rb, Sb
    grid = (B // tb,)

    kern = functools.partial(_gram_kernel, has_joints, E, J)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, J3, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, EJ, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, PJ, tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bJ_cm.shape[1], tb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J3 * J3, E * E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((J3, EJ), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((J3, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, J), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((E * E, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * E, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E * E, B), jnp.float32),
            jax.ShapeDtypeStruct((3 * E, B), jnp.float32),
            jax.ShapeDtypeStruct((E, B), jnp.float32),
            jax.ShapeDtypeStruct((3, B), jnp.float32),
        ],
        interpret=interpret,
    )(R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d, q, w1)


def gram_assembly_ref(R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d, q, w1,
                      has_joints: bool):
    """Pure-XLA statement of the gram-assembly math (fallback semantics and
    the backward implementation of the custom VJP)."""
    _, J3, B = R_cm.shape
    E = sd1_2d.shape[1]
    hi = jax.lax.Precision.HIGHEST
    X = jnp.einsum('ajb,akb->jkb', R_cm, R_cm, precision=hi).reshape(J3 * J3, B)
    G = jnp.einsum('xe,xb->eb', ksd, X, precision=hi)  # (E*E, B)
    T3 = T_cm.reshape(3, E, -1, B)
    Z3 = jnp.einsum('jx,ajb->axb', lz, R_cm, precision=hi).reshape(3, E, -1, B)
    M1 = jnp.einsum('aejb,afjb->efb', Z3, T3, precision=hi)
    Q3 = jnp.einsum('jk,aekb->aejb', q, T3, precision=hi)
    M2 = jnp.einsum('aejb,afjb->efb', Q3, T3, precision=hi)
    G = G + (M1 + jnp.swapaxes(M1, 0, 1) + M2).reshape(E * E, B)
    SA = jnp.einsum('je,ajb->aeb', sd1_2d, R_cm, precision=hi) + jnp.einsum(
        'j,aejb->aeb', w1[:, 0], T3, precision=hi
    )
    rb = jnp.einsum('aejb,ajb->eb', T3, y_cm, precision=hi)
    Sb = jnp.sum(y_cm, axis=1)  # (3, B)
    if has_joints:
        P3 = P_cm.reshape(3, E, -1, B)
        G = G + jnp.einsum('aejb,afjb->efb', P3, P3, precision=hi).reshape(E * E, B)
        SA = SA + jnp.sum(P3, axis=2)
        rb = rb + jnp.einsum('aejb,ajb->eb', P3, bJ_cm, precision=hi)
        Sb = Sb + jnp.sum(bJ_cm, axis=1)
    return G, SA.reshape(3 * E, B), rb, Sb


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _gram_assembly_diff(R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d, q, w1,
                        has_joints, interpret):
    return _gram_assembly_impl(R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d,
                               q, w1, has_joints, interpret)


def _gram_assembly_fwd(R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d, q, w1,
                       has_joints, interpret):
    out = _gram_assembly_impl(R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d,
                              q, w1, has_joints, interpret)
    return out, (R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d, q, w1)


def _gram_assembly_bwd(has_joints, interpret, res, g):
    R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d, q, w1 = res
    _, vjp = jax.vjp(
        lambda R, T, y, P, bJ: gram_assembly_ref(
            R, T, y, P, bJ, ksd, lz, sd1_2d, q, w1, has_joints
        ),
        R_cm, T_cm, y_cm, P_cm, bJ_cm,
    )
    dR, dT, dy, dP, dbJ = vjp(tuple(g))
    return (dR, dT, dy, dP, dbJ, jnp.zeros_like(ksd), jnp.zeros_like(lz),
            jnp.zeros_like(sd1_2d), jnp.zeros_like(q), jnp.zeros_like(w1))


_gram_assembly_diff.defvjp(_gram_assembly_fwd, _gram_assembly_bwd)


@functools.partial(jax.jit, static_argnames=('has_joints', 'interpret'))
def gram_assembly(R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d, q, w1,
                  has_joints: bool = False, interpret: bool = False):
    """Fused shape-solve Gramian assembly (see :func:`gram_assembly_ref` for
    the math). Inputs are batch-lane-major:

        R_cm (3, J*3, B): glob rotmats, rows (j, c) j-major.
        T_cm (3, E*J, B): joint translation Jacobian columns, rows (e, j).
        y_cm (3, J, B): skinning-weighted residual sums (from rhs_moments).
        P_cm (3, E*J, B), bJ_cm (3, J, B): joints block (dummies (3, 1, B)
            when ``has_joints`` is False).
        ksd (J3*J3, E*E), lz (J3, E*J), sd1_2d (J3, E), q (J, J), w1 (J, 1):
            static joint-pair moments.

    Returns G (E*E, B), SA (3E, B), rb (E, B), Sb (3, B).
    """
    return _gram_assembly_diff(R_cm, T_cm, y_cm, P_cm, bJ_cm, ksd, lz, sd1_2d,
                               q, w1, has_joints, interpret)


# ---------------------------------------------------------------------------
# Weighted-Gramian kernel: the shape solve's normal equations under RUNTIME
# per-vertex fit weights ω (B-varying), which break the static joint-pair
# moment factorization (build_gram_data's Ksd/Lsd/q are ω-weighted V-sums).
# Instead of materializing the (B, V, 3, E) design matrix (the streamed
# fallback: chunked HBM traffic, ~14x slower than the unweighted fit), the
# per-vertex beta-Jacobian jac_v = R̄_v·SD_v + T̄_v is rebuilt in VMEM chunk by
# chunk — reusing the LBS blends as R̄ — and reduced on the fly into
#
#   G  = Σ_v ω_v jac_vᵀ jac_v        (E, E)  quadratic block
#   SA = Σ_v ω_v jac_v               (3, E)  translation cross block
#   r  = Σ_v ω_v jac_vᵀ b_v          (E,)    residual projection
#   Sb = Σ_v ω_v b_v                 (3,)    translation rhs
#   W  = Σ_v ω_v                             translation diagonal
#
# per batch lane (b_v = target - LBS position). These are exactly the
# augmented-system pieces the unweighted solve assembles from moments, so the
# solve/regularizer/recon tail is shared (models/shape_gram.py).
# Reference semantics: the runtime-weighted rows of the general lstsq,
# /root/reference/src/smplfitter/np/bodyfitter.py:758-766, 814-824.
# ---------------------------------------------------------------------------


VC_W = 128  # wgram vertex chunk for small models (see wgram_chunk). With
# the cached posed template the (4, vc_w, F) constants and (F, tb) features
# are gone from the kernel, and 128 rows double the M-utilization of the
# per-(a,e) T̄ blend dots (M=64 fills half the MXU's 128 systolic rows).
VC_W_LARGE = 64  # large-J models: the 3·E1 live Jacobian columns plus the
# (3E, nt·jp, tb) T4 operand exceed scoped VMEM at 128 rows (measured:
# SMPL-X at vc_w=128 wants 17.2 MB > 16 MB even at tb=32)..


def wgram_chunk(num_joints: int) -> int:
    """Wgram vertex chunk per model size. With the posed template supplied
    as a cached input (:func:`posed_template_lm`) the kernel no longer holds
    the (4, vc_w, F) constants or the (F, tb) features in VMEM, so small-J
    models take 128-row chunks (full MXU M on the T̄ dots); large-J models
    (their E is large too, and the T4 operand scales with both) stay at 64.
    MUST agree between the layout built at GramData construction
    (models/shape_gram.py) and the kernel launch — both pass the model's
    joint count."""
    return VC_W if num_joints <= 32 else VC_W_LARGE


def wgram_batch_limit(n_feat: int) -> int | None:
    """Largest single-call batch for the runtime-ω kernel path on a model
    with ``n_feat`` homogeneous features (None = unlimited).

    This environment's chipless remote AOT compiler crashes on the large-F
    wgram program once the batch grid grows (SMPL-X at vc_w=32: b128
    (grid 1×328) compiles, b4096 (grid 32×328) kills the compile helper).
    Per-instance fits decompose exactly over the batch, so the fitter maps
    runtime-weighted fits over chunks of this size (models/bodyfitter.py)."""
    return 128 if n_feat > 320 else None


def _wgram_kernel(nt, nchunks, rem, E, scale_mode, subset, *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    (tgt_ref, pjp_ref, h_ref, wtsp_ref, sd_ref, t4p_ref,
     mu_ref, om_ref) = refs[:8]
    refs = refs[8:]
    mu_s_ref = refs.pop(0) if scale_mode else None
    g_ref, sa_ref, r_ref, sb_ref, w_ref = refs
    k = pl.program_id(1)
    s6 = _blend_s6(starts_ref, k, nt)

    @pl.when(k == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)
        sa_ref[:] = jnp.zeros_like(sa_ref)
        r_ref[:] = jnp.zeros_like(r_ref)
        sb_ref[:] = jnp.zeros_like(sb_ref)
        w_ref[:] = jnp.zeros_like(w_ref)

    blend = _lbs_blend(pjp_ref, wtsp_ref, s6)
    # Posed template from the cached channels (posed_template_lm) — the
    # in-kernel K=F homog dots (and the (4, vc_w, F) consts re-streamed per
    # batch tile) are gone from this kernel entirely.
    homog = [h_ref[c] for c in range(3)]
    pos = [
        sum(blend[a * 4 + c] * homog[c] for c in range(3)) + blend[a * 4 + 3]
        for a in range(3)
    ]
    om = _mask_tail_rows(om_ref[:], k, nchunks, rem)  # (VC_W, TB)
    # √ω factorization: the ω-weighted quadratic block is Σ (√ω jac)(√ω jac)ᵀ,
    # so only ONE weighted copy of the Jacobian is ever live — the 3·E1
    # (VC_W, TB) columns are the kernel's VMEM budget (an unweighted copy
    # PLUS an ω-weighted copy, as the naive formulation holds, exceeds
    # scoped VMEM at production tiles). ω ≥ 0 (fit confidences); (√ω)² ≈ ω
    # to 1 ulp, far below the solve's f32 envelope.
    som = jnp.sqrt(om)
    wp = wtsp_ref[:]
    t_vals = [_mask_tail_rows(tgt_ref[a], k, nchunks, rem) for a in range(3)]
    b = [t_vals[a] - pos[a] for a in range(3)]
    b_w = [som * b[a] for a in range(3)]  # √ω b (pairs with √ω jac for r)
    wb = [om * b[a] for a in range(3)]  # ω b (Sb)

    # jac_w[a][e] (VC_W, TB) = √ω (Σ_c R̄[a,c] SD[c,e] + T̄[a,e] − μ[a,e]);
    # T̄ via K-packed single-pass blends (same 6J contraction as the [R|t]
    # blends). μ is the exact ω-weighted Jacobian mean: centering removes the
    # translation columns' common mode, whose f32 cancellation in the
    # trans-elimination Schur step otherwise costs ~3 digits. Pad rows
    # become −μ, but every reduction below gates them through masked ω.
    jac_w = []
    for a in range(3):
        row = []
        for e in range(E):
            t_ae = (
                _dot1(wp, t4p_ref[a * E + e, pl.ds(s6, wp.shape[1]), :], _MM)
                - mu_ref[a * E + e:a * E + e + 1]
            )
            for c in range(3):
                sd_col = sd_ref[c][:, e:e + 1]  # (VC_W, 1)
                t_ae = t_ae + blend[a * 4 + c] * sd_col
            row.append(som * t_ae)
        jac_w.append(row)
    if scale_mode:
        # One extra column: −tgt (scale_target, mode 1) or pos (scale_fit,
        # mode 2), centered by the caller-supplied per-batch mean μ_s. The
        # augmented solve then treats scale exactly like a shape column; the
        # moment-linearity gymnastics of the unweighted path are unnecessary.
        # Pad rows become −μ_s, gated through masked ω like jac's −μ.
        for a in range(3):
            col = -t_vals[a] if scale_mode == 1 else pos[a]
            jac_w[a].append(som * (col - mu_s_ref[a:a + 1]))
    E1 = E + (1 if scale_mode else 0)

    # Symmetric quadratic block: upper triangle computed once, mirrored.
    vals = {}
    for e in range(E1):
        for f in range(e, E1):
            s = sum(jac_w[a][e] * jac_w[a][f] for a in range(3))
            vals[(e, f)] = jnp.sum(s, axis=0, keepdims=True)  # (1, TB)
    g_ref[:] += jnp.concatenate(
        [vals[(min(e, f), max(e, f))] for e in range(E1) for f in range(E1)],
        axis=0,
    )
    sa_ref[:] += jnp.concatenate(
        [
            jnp.sum(som * jac_w[a][e], axis=0, keepdims=True)
            for a in range(3)
            for e in range(E1)
        ],
        axis=0,
    )
    r_ref[:] += jnp.concatenate(
        [
            jnp.sum(
                sum(jac_w[a][e] * b_w[a] for a in range(3)), axis=0,
                keepdims=True,
            )
            for e in range(E1)
        ],
        axis=0,
    )
    sb_ref[:] += jnp.concatenate(
        [jnp.sum(wb[a], axis=0, keepdims=True) for a in range(3)], axis=0
    )
    w_ref[:] += jnp.sum(om, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=('scale_mode', 'interpret'))
def wgram_moments(tgt_vm, pj_cm, homog_vm, t4_cm, weights_pad,
                  sd_cm, mu_cm, omega_vm, mu_s=None, scale_mode: int = 0,
                  interpret: bool = False,
                  layout: BlendLayout | None = None):
    """Runtime-ω shape-solve normal equations (see the section comment).

    Args:
        tgt_vm: (3, V, B) targets, component-major (edge chunk masked).
        pj_cm: (12, J, B) per-joint [R|t] entries, leading index (a, c4).
        homog_vm: (3, V_pad, B) cached posed template
            (:func:`posed_template_lm`) — replaces the in-kernel K=F homog
            dots and the per-batch-tile (4, vc_w, F) consts streaming.
        t4_cm: (3E, J, B) FK translation beta-Jacobians, rows (a, e) a-major.
        weights_pad: (V_pad, J) skinning weights (zero rows in padding).
        sd_cm: (3, V_pad, E) shape directions, component-major.
        mu_cm: (3E, B) ω-weighted Jacobian mean, rows (a, e) a-major —
            subtracted from every per-vertex Jacobian (centering; see
            models/shape_gram.weighted_jac_mean_lm). Pass zeros to disable.
        omega_vm: (V, B) runtime per-vertex fit weights.
        mu_s: (3, B) scale-column centering mean, required when
            ``scale_mode``; any per-batch constant is exact (it folds into the
            translation change of variables) — the caller passes ∓ the
            ω-weighted target mean.
        scale_mode: 0 = no scale column, 1 = scale_target (column −tgt),
            2 = scale_fit (column pos). Adds one trailing column to the
            per-vertex Jacobian in-kernel, so all outputs are E1 = E+1 wide.

    Returns G (E1*E1, B), SA (3*E1, B), r (E1, B), Sb (3, B), W (1, B) of the
    CENTERED system (E1 = E + 1 when ``scale_mode`` else E); the caller
    recovers the true translation as t = t' − μᵀx after the solve.

    No custom VJP: runtime-weighted fits follow ``autodiff_policy`` and fall
    back to the streamed XLA solve under gradient traces.
    """
    _, v_t, B = tgt_vm.shape
    v_pad = weights_pad.shape[0]
    J = weights_pad.shape[1]
    E = sd_cm.shape[2]
    E1 = E + (1 if scale_mode else 0)
    tb = pick_batch_tile(B)
    if tb == 256:
        tb = 128  # the (3E, 6J, tb) T4 operand bounds VMEM
    vc_w = wgram_chunk(J)
    # Iterate only chunks that contain REAL vertices: v_pad is a multiple of
    # the (larger) shared VC, so it may hold whole all-padding vc_w chunks at
    # the tail — their rows are zero in the static operands and ω-masked
    # anyway, so they are simply skipped.
    nchunks = -(-v_t // vc_w)
    assert tb is not None and v_pad % vc_w == 0 and nchunks * vc_w <= v_pad
    assert omega_vm.shape == (v_t, B), (omega_vm.shape, v_t, B)
    assert (mu_s is not None) == bool(scale_mode)
    grid = (B // tb, nchunks)
    if layout is None:
        layout = default_layout(weights_pad, vc_w)
    jp_l, jr = layout.jp, layout.jr
    subset = not layout.full
    pjp = pack_pj(pj_cm, layout)
    t4p = pack_pj(t4_cm, layout)

    in_specs = ([_starts_spec(nchunks)] if subset else []) + [
        pl.BlockSpec((3, vc_w, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((12, layout.nt * jp_l, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, vc_w, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((vc_w, layout.nt * jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, vc_w, E), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * E, layout.nt * jp_l, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * E, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((vc_w, tb), lambda i, k: (k, i), memory_space=pltpu.VMEM),
    ]
    operands = ([layout.starts] if subset else []) + [
        tgt_vm, pjp, homog_vm, layout.wtsp_sub, sd_cm, t4p,
        mu_cm, omega_vm]
    if scale_mode:
        in_specs.append(
            pl.BlockSpec((3, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM)
        )
        operands.append(mu_s)

    return pl.pallas_call(
        functools.partial(_wgram_kernel, layout.nt, nchunks, v_t % vc_w, E, scale_mode,
                          subset),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((E1 * E1, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * E1, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((E1, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E1 * E1, B), jnp.float32),
            jax.ShapeDtypeStruct((3 * E1, B), jnp.float32),
            jax.ShapeDtypeStruct((E1, B), jnp.float32),
            jax.ShapeDtypeStruct((3, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Homog-cache fast path: within one fit iteration the rhs kernel and the
# recon+part-sums kernel run with the SAME rotations, so the posed template
# (the K=F homog dots — the largest single dot group of both kernels) is
# computed once by rhs_moments and handed to the recon kernel, which only
# adds the solved-beta step sd·x (a cheap rank-E update on the VPU).
# Measured at b4096/SMPL: recon drops ~0.5 ms/call; the rhs homog write is
# hidden under its MXU time.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _rhs_h_diff(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                interpret, layout):
    return _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                             sd_cm, interpret=interpret, layout=layout,
                             emit_homog=True)


def _rhs_h_fwd(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
               interpret, layout):
    out = _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                            sd_cm, interpret=interpret, layout=layout,
                            emit_homog=True)
    return out, (tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                 layout)


def _rhs_h_bwd_rule(interpret, res, g):
    tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm, layout = res
    gr, gy, gh = g
    dtgt, dpj, dfeat = _rhs_moments_bwd(
        tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm, gr, gy,
        gh=gh, interpret=interpret, layout=layout,
    )
    return (dtgt, dpj, dfeat, jnp.zeros_like(weights_pad),
            jnp.zeros_like(consts_pad), jnp.zeros_like(sd_cm),
            jax.tree.map(jnp.zeros_like, layout))


_rhs_h_diff.defvjp(_rhs_h_fwd, _rhs_h_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _rhs_h_w_diff(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                  omega, interpret, layout):
    return _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                             sd_cm, omega=omega, interpret=interpret,
                             layout=layout, emit_homog=True)


def _rhs_h_w_fwd(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                 omega, interpret, layout):
    out = _rhs_moments_impl(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                            sd_cm, omega=omega, interpret=interpret,
                            layout=layout, emit_homog=True)
    return out, (tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                 omega, layout)


def _rhs_h_w_bwd_rule(interpret, res, g):
    (tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm, omega,
     layout) = res
    gr, gy, gh = g
    dtgt, dpj, dfeat = _rhs_moments_bwd(
        tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm, gr, gy,
        gh=gh, omega=omega, interpret=interpret, layout=layout,
    )
    return (dtgt, dpj, dfeat, jnp.zeros_like(weights_pad),
            jnp.zeros_like(consts_pad), jnp.zeros_like(sd_cm),
            jnp.zeros_like(omega), jax.tree.map(jnp.zeros_like, layout))


_rhs_h_w_diff.defvjp(_rhs_h_w_fwd, _rhs_h_w_bwd_rule)


@functools.partial(jax.jit, static_argnames=('interpret',))
def rhs_moments_h(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad, sd_cm,
                  omega=None, interpret: bool = False,
                  layout: BlendLayout | None = None):
    """:func:`rhs_moments` that additionally returns the posed-template homog
    channels (3, V_pad, B) for this iteration's cached-recon kernel. ``omega``
    must be None or a static (V_pad, 1) column (runtime-ω callers use the
    uncached kernels)."""
    if layout is None:
        layout = default_layout(weights_pad, VC)
    if omega is None:
        return _rhs_h_diff(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                           sd_cm, interpret, layout)
    assert not _runtime_omega(omega)
    return _rhs_h_w_diff(tgt_vm, pj_cm, feat_cols, weights_pad, consts_pad,
                         sd_cm, omega, interpret, layout)


HOMOG_GEMM_MIN_F = 320
# Pipeline gate for the UNWEIGHTED solve path: models whose homogeneous
# feature is wider than this (SMPL-X F=487, SMPL+H F=460) compute the posed
# template once per iteration as a standalone 3-pass GEMM
# (posed_template_lm) and run the cached-homog rhs kernel; the in-kernel
# homog dots would otherwise re-stream the (4, V_pad, F) constants once per
# batch tile (SMPL-X b4096: ~2.6 GB/call) and force the batch tile down to
# 128 by VMEM. Small-F models keep the in-kernel dots (the cache's extra
# (3, V_pad, B) HBM round trip costs about what the consts streaming does).
# The runtime-ω wgram kernel uses the cache at EVERY F (its vc_w=64 chunks
# re-stream consts B/tb >= 16 times, so the cache always wins there).


def _dot3_mask(a, b, dimension_numbers):
    """XLA-level 3-pass f32-emulated dot (trace-level twin of the kernels'
    :func:`_dot3`): hi parts via fold-proof mantissa masking
    (:func:`_trunc_bf16` — the astype split would be constant-folded under
    ``--xla_allow_excess_precision``), each pass one bf16 MXU pass
    (``Precision.DEFAULT`` on f32 operands)."""
    a_hi = _trunc_bf16(a)
    b_hi = _trunc_bf16(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(a_hi, b_hi) + d(a - a_hi, b_hi) + d(a_hi, b - b_hi)


def _posed_template_kernel(feat_ref, consts_ref, out_ref):
    for c in range(3):
        out_ref[c] = _mm3(consts_ref[c], feat_ref[:])


def _posed_template_impl(feat_cols, consts_pad, interpret: bool):
    """One-pass Pallas statement of the posed-template GEMM.

    Grid is CHUNK-OUTER / batch-inner: the (4, VC, F) consts block index is
    constant over the inner batch sweep, so the constants are fetched once
    per chunk — i.e. ONCE per call — and each output block is written
    exactly once (no accumulation, so this grid order is legal, unlike the
    reduction kernels'). The in-VMEM 3-pass accumulation is what an XLA
    dot_general chain can NOT express: emulated at the XLA level the nine
    per-pass (V_pad, B) partials materialize in HBM (measured ~16 ms of the
    SMPL-X b4096 fit vs ~3 ms for this kernel)."""
    F, B = feat_cols.shape
    v_pad = consts_pad.shape[1]
    tb = pick_batch_tile(B)
    assert tb is not None and v_pad % VC == 0
    grid = (v_pad // VC, B // tb)
    return pl.pallas_call(
        _posed_template_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((F, tb), lambda k, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, VC, F), lambda k, i: (0, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, VC, tb), lambda k, i: (0, k, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, v_pad, B), jnp.float32),
        interpret=interpret,
    )(feat_cols, consts_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def posed_template_lm(feat_cols, consts_pad, interpret: bool = False):
    """Posed zero-beta template, component-major (3, V_pad, B): the K=F
    "homog" channels homog_c = consts_c · feat shared by every extended-LBS
    kernel of one iteration (same rotations → same posed template). Computed
    as one standalone Pallas GEMM so the (4, V_pad, F) constants are read
    ONCE per iteration instead of once per batch tile inside each kernel;
    consumers take the ``homog_vm`` operand (rhs_moments_cached /
    wgram_moments / recon_part_sums_cached_lm). Channel 3 is identically 1
    (see models/shape_gram.build_gram_data) and is not materialized."""
    if kernel_mode(feat_cols.shape[1]) is None and not interpret:
        # Non-kernel environments (plain CPU paths) state the same math at
        # XLA level — fold-proof mantissa-masked 3-pass emulation.
        return jnp.stack(
            [_dot3_mask(consts_pad[c], feat_cols, _MM) for c in range(3)],
            axis=0,
        )
    return _posed_template_impl(feat_cols, consts_pad, interpret)


def _posed_template_fwd(feat_cols, consts_pad, interpret):
    return posed_template_lm(feat_cols, consts_pad, interpret), consts_pad


def _posed_template_bwd(interpret, consts_pad, dh):
    # Linear in feat: dfeat = Σ_c consts_cᵀ dh_c, same 3-pass emulation (the
    # bitmask splits are not differentiable, hence the custom VJP).
    dfeat = sum(_dot3_mask(consts_pad[c], dh[c], _C0_0) for c in range(3))
    return dfeat, jnp.zeros_like(consts_pad)


posed_template_lm.defvjp(_posed_template_fwd, _posed_template_bwd)


def _rhs_cached_bwd_kernel(nt, nchunks, rem, weighted, subset, *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    if weighted:
        (gr_ref, gy_ref, tgt_ref, pjp_ref, h_ref, wtsp_ref, wfull_ref,
         sd_ref, om_ref, dtgt_ref, dpj_ref, dh_ref) = refs
    else:
        (gr_ref, gy_ref, tgt_ref, pjp_ref, h_ref, wtsp_ref, wfull_ref,
         sd_ref, dtgt_ref, dpj_ref, dh_ref) = refs
    k = pl.program_id(1)
    s6 = _blend_s6(starts_ref, k, nt)
    w = wfull_ref[:]  # (VC, J) plain full-width weights
    homog = [h_ref[c] for c in range(3)]
    blend = _lbs_blend(pjp_ref, wtsp_ref, s6)
    pos = [
        sum(blend[a * 4 + c] * homog[c] for c in range(3)) + blend[a * 4 + 3]
        for a in range(3)
    ]
    b = [
        _mask_tail_rows(tgt_ref[a], k, nchunks, rem) - pos[a] for a in range(3)
    ]
    G = [_mm3(sd_ref[c], gr_ref[:]) for c in range(3)]
    contract_j0 = (((1,), (0,)), ((), ()))
    db = []
    for a in range(3):
        db_a = _dot3(w, gy_ref[a], contract_j0)  # (VC, TB)
        for c in range(3):
            db_a += blend[a * 4 + c] * G[c]
        if weighted:
            db_a = db_a * om_ref[:]
        dtgt_ref[a] = db_a
        db.append(db_a)
    if weighted:
        b = [x * om_ref[:] for x in b]

    @pl.when(k == 0)
    def _():
        dpj_ref[:] = jnp.zeros_like(dpj_ref)

    for a in range(3):
        for c in range(4):
            dblend = -db[a] * homog[c] if c < 3 else -db[a]
            if c < 3:
                dblend = dblend + G[c] * b[a]
            dpj_ref[a * 4 + c] += _dot3(dblend, w, _C0_0)  # (TB, J)
    # The homog cotangent is PER-VERTEX (written once per chunk, not
    # accumulated) — posed_template_lm's own VJP folds it onto feat.
    for c in range(3):
        dh_ref[c] = -sum(blend[a * 4 + c] * db[a] for a in range(3))


def _rhs_cached_bwd(tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, gr, gy,
                    omega=None, interpret=False, layout=None):
    _, v_t, B = tgt_vm.shape
    v_pad = weights_pad.shape[0]
    J = weights_pad.shape[1]
    E = sd_cm.shape[2]
    if layout is None:
        layout = default_layout(weights_pad, VC)
    tb = _shrink_tb(
        pick_batch_tile(B),
        # 12·VC input/output blocks + ~21·VC in-kernel scratch (blend, pos,
        # G, db temporaries) per batch column.
        lambda t: (
            33 * VC + 12 * layout.nt * layout.jp + E + 3 * J + 12 * J
        ) * t + VC * (layout.nt * layout.jr + J + 3 * E),
    )
    vc = _bwd_vc(B, tb)
    nchunks = v_pad // vc
    grid = (B // tb, nchunks)
    pjp = pack_pj(pj_cm, layout)
    weighted = omega is not None
    subset = not layout.full

    in_specs = ([_starts_spec(nchunks)] if subset else []) + [
        pl.BlockSpec((E, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((12, layout.nt * layout.jp, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((vc, layout.nt * layout.jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((vc, J), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, vc, E), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
    ]
    operands = ([_starts_at(layout, vc)] if subset else []) + [
        gr, gy, tgt_vm, pjp, homog_vm, layout.wtsp_sub, weights_pad, sd_cm]
    if weighted:
        in_specs.append(
            pl.BlockSpec((vc, 1), lambda i, k: (k, 0), memory_space=pltpu.VMEM)
        )
        operands.append(omega)

    dtgt, dpj, dh = pl.pallas_call(
        functools.partial(_rhs_cached_bwd_kernel, layout.nt, nchunks, v_t % vc, weighted,
                          subset),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, J), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, v_t, B), jnp.float32),
            jax.ShapeDtypeStruct((12, B, J), jnp.float32),
            jax.ShapeDtypeStruct((3, v_pad, B), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return dtgt, jnp.transpose(dpj, (0, 2, 1)), dh


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _rhs_c_diff(tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, interpret,
                layout):
    return _rhs_moments_impl(tgt_vm, pj_cm, None, weights_pad, None, sd_cm,
                             interpret=interpret, layout=layout,
                             homog_vm=homog_vm)


def _rhs_c_fwd(tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, interpret,
               layout):
    out = _rhs_moments_impl(tgt_vm, pj_cm, None, weights_pad, None, sd_cm,
                            interpret=interpret, layout=layout,
                            homog_vm=homog_vm)
    return out, (tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, layout)


def _rhs_c_bwd_rule(interpret, res, g):
    tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, layout = res
    gr, gy = g
    dtgt, dpj, dh = _rhs_cached_bwd(
        tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, gr, gy,
        interpret=interpret, layout=layout,
    )
    return (dtgt, dpj, dh, jnp.zeros_like(weights_pad),
            jnp.zeros_like(sd_cm), jax.tree.map(jnp.zeros_like, layout))


_rhs_c_diff.defvjp(_rhs_c_fwd, _rhs_c_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _rhs_c_w_diff(tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, omega,
                  interpret, layout):
    return _rhs_moments_impl(tgt_vm, pj_cm, None, weights_pad, None, sd_cm,
                             omega=omega, interpret=interpret, layout=layout,
                             homog_vm=homog_vm)


def _rhs_c_w_fwd(tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, omega,
                 interpret, layout):
    out = _rhs_moments_impl(tgt_vm, pj_cm, None, weights_pad, None, sd_cm,
                            omega=omega, interpret=interpret, layout=layout,
                            homog_vm=homog_vm)
    return out, (tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, omega, layout)


def _rhs_c_w_bwd_rule(interpret, res, g):
    tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, omega, layout = res
    gr, gy = g
    dtgt, dpj, dh = _rhs_cached_bwd(
        tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, gr, gy, omega=omega,
        interpret=interpret, layout=layout,
    )
    return (dtgt, dpj, dh, jnp.zeros_like(weights_pad),
            jnp.zeros_like(sd_cm), jnp.zeros_like(omega),
            jax.tree.map(jnp.zeros_like, layout))


_rhs_c_w_diff.defvjp(_rhs_c_w_fwd, _rhs_c_w_bwd_rule)


@functools.partial(jax.jit, static_argnames=('scale', 'interpret'))
def rhs_moments_cached(tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm,
                       omega=None, scale: bool = False,
                       interpret: bool = False,
                       layout: BlendLayout | None = None):
    """:func:`rhs_moments` from a CACHED posed template (see
    :func:`posed_template_lm`): identical outputs, no feat/consts operands.
    Differentiable for the None / static-(V_pad, 1) ``omega`` cases (the
    homog cotangent flows back through posed_template_lm's VJP); scale and
    runtime-ω variants follow ``autodiff_policy`` like their uncached twins.
    """
    if layout is None:
        layout = default_layout(weights_pad, VC)
    if scale:
        return _rhs_moments_impl(tgt_vm, pj_cm, None, weights_pad, None,
                                 sd_cm, omega=omega, scale=True,
                                 interpret=interpret, layout=layout,
                                 homog_vm=homog_vm)
    if omega is None:
        return _rhs_c_diff(tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm,
                           interpret, layout)
    if _runtime_omega(omega):
        return _rhs_moments_impl(tgt_vm, pj_cm, None, weights_pad, None,
                                 sd_cm, omega=omega, interpret=interpret,
                                 layout=layout, homog_vm=homog_vm)
    return _rhs_c_w_diff(tgt_vm, pj_cm, homog_vm, weights_pad, sd_cm, omega,
                         interpret, layout)


def _sdx_chunk(sd_ref, x_ref, E):
    """sd·x per chunk on the VPU: E rank-1 broadcast updates per channel
    (the MXU form would pad K=E to a full 128 lane tile)."""
    out = []
    for c in range(3):
        acc = None
        for e in range(E):
            term = sd_ref[c][:, e:e + 1] * x_ref[e:e + 1, :]
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _recon_cached_kernel(nt, nchunks, rem, E, weighted, subset, *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    if weighted:
        (tgt_ref, pjp_ref, x_ref, wtsp_ref, sd_ref, h_ref, pm_ref, om_ref,
         raw_ref, st_ref, sa_ref) = refs
    else:
        (tgt_ref, pjp_ref, x_ref, wtsp_ref, sd_ref, h_ref, pm_ref,
         raw_ref, st_ref, sa_ref) = refs
    k = pl.program_id(1)
    s6 = _blend_s6(starts_ref, k, nt)

    @pl.when(k == 0)
    def _():
        raw_ref[:] = jnp.zeros_like(raw_ref)
        st_ref[:] = jnp.zeros_like(st_ref)
        sa_ref[:] = jnp.zeros_like(sa_ref)

    blend = _lbs_blend(pjp_ref, wtsp_ref, s6)
    sdx = _sdx_chunk(sd_ref, x_ref, E)
    hfull = [h_ref[c] + sdx[c] for c in range(3)]
    pos = [
        sum(blend[a * 4 + c] * hfull[c] for c in range(3)) + blend[a * 4 + 3]
        for a in range(3)
    ]
    pm = pm_ref[:]  # (J, VC)
    contract = (((1,), (0,)), ((), ()))
    if weighted:
        om = _mask_tail_rows(om_ref[:], k, nchunks, rem)
        pos = [p * om for p in pos]
    for c in range(3):
        t_c = _mask_tail_rows(tgt_ref[c], k, nchunks, rem)
        st_in = t_c * om if weighted else t_c
        st_ref[c] += _dot2_exact_a(pm, st_in, contract)
        for d in range(3):
            raw_ref[c * 3 + d] += _dot2_exact_a(pm, t_c * pos[d], contract)
    for d in range(3):
        sa_ref[d] += _dot2_exact_a(pm, pos[d], contract)


def _recon_cached_impl(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                       layout: BlendLayout, omega=None,
                       interpret: bool = False):
    _, v_t, B = tgt_vm.shape
    v_pad = sd_cm.shape[1]
    J = pm.shape[0]
    E = x_cols.shape[0]
    jp_l, jr = layout.jp, layout.jr
    tb = _shrink_tb(
        pick_batch_tile(B),
        # 6·VC double-buffered input/output blocks + ~24·VC single-buffered
        # in-kernel scratch (blend, sdx, hfull, pos temporaries) per batch
        # column. Scratch is NOT double-buffered, so it enters the 8×-scaled
        # model at half weight, against the real 16 MB scoped limit (15 MB
        # with margin). Measured: the block-only model kept tb=256 at SMPL-X
        # b1024 and overflowed scoped VMEM (17.3 MB > 16 MB); SMPL at tb=256
        # fits (~13 MB) and must not shrink.
        lambda t: (6 * VC + 12 * VC + 12 * layout.nt * jp_l + E + 15 * J) * t
        + VC * (layout.nt * jr + 3 * E + J),
        limit_bytes=15 * 2 ** 20,
    )
    nchunks = v_pad // VC
    assert tb is not None and v_pad % VC == 0
    grid = (B // tb, nchunks)
    pjp = pack_pj(pj_cm, layout)
    weighted = omega is not None
    subset = not layout.full

    in_specs = ([_starts_spec(nchunks)] if subset else []) + [
        pl.BlockSpec((3, VC, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((12, layout.nt * jp_l, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((VC, layout.nt * jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, VC, E), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, VC, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((J, VC), lambda i, k: (0, k), memory_space=pltpu.VMEM),
    ]
    operands = ([layout.starts] if subset else []) + [
        tgt_vm, pjp, x_cols, layout.wtsp_sub, sd_cm, homog_vm, pm]
    if weighted:
        in_specs.append(_omega_spec(omega, tb))
        operands.append(omega)

    return pl.pallas_call(
        functools.partial(_recon_cached_kernel, layout.nt, nchunks, v_t % VC, E,
                          weighted, subset),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((9, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, J, B), jnp.float32),
            jax.ShapeDtypeStruct((3, J, B), jnp.float32),
            jax.ShapeDtypeStruct((3, J, B), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


def _recon_cached_bwd_kernel(nt, nchunks, rem, E, weighted, subset, *refs):
    refs = list(refs)
    starts_ref = refs.pop(0) if subset else None
    if weighted:
        (tgt_ref, pjp_ref, x_ref, wtsp_ref, wfull_ref, sd_ref, h_ref, pm_ref,
         om_ref, graw_ref, gst_ref, gsa_ref,
         dtgt_ref, dpj_ref, dx_ref, dh_ref) = refs
    else:
        (tgt_ref, pjp_ref, x_ref, wtsp_ref, wfull_ref, sd_ref, h_ref, pm_ref,
         graw_ref, gst_ref, gsa_ref,
         dtgt_ref, dpj_ref, dx_ref, dh_ref) = refs
    k = pl.program_id(1)
    s6 = _blend_s6(starts_ref, k, nt)
    pm = pm_ref[:]
    contract_j = (((0,), (0,)), ((), ()))
    blend = _lbs_blend(pjp_ref, wtsp_ref, s6)
    sdx = _sdx_chunk(sd_ref, x_ref, E)
    hfull = [h_ref[c] + sdx[c] for c in range(3)]
    pos = [
        sum(blend[a * 4 + c] * hfull[c] for c in range(3)) + blend[a * 4 + 3]
        for a in range(3)
    ]
    om = om_ref[:] if weighted else None
    W = [_dot2_exact_a(pm, graw_ref[x], contract_j) for x in range(9)]
    for c in range(3):
        acc = _dot2_exact_a(pm, gst_ref[c], contract_j)
        for d in range(3):
            # pos here is the UNWEIGHTED reconstruction: the forward's single
            # ω factor lands once via the trailing multiply.
            acc += W[c * 3 + d] * pos[d]
        dtgt_ref[c] = acc * om if weighted else acc
    tgt = [_mask_tail_rows(tgt_ref[c], k, nchunks, rem) for c in range(3)]
    dpos = []
    for d in range(3):
        acc = _dot2_exact_a(pm, gsa_ref[d], contract_j)
        for c in range(3):
            acc += W[c * 3 + d] * tgt[c]
        dpos.append(acc * om if weighted else acc)

    @pl.when(k == 0)
    def _():
        dpj_ref[:] = jnp.zeros_like(dpj_ref)
        dx_ref[:] = jnp.zeros_like(dx_ref)

    w = wfull_ref[:]
    dh = []
    for c in range(3):
        dh_c = sum(blend[a * 4 + c] * dpos[a] for a in range(3))
        dh_ref[c] = dh_c
        dh.append(dh_c)
        dx_ref[:] += _dot3(sd_ref[c], dh_c, _C0_0)  # (E, TB)
    for a in range(3):
        for c in range(4):
            dblend = dpos[a] * hfull[c] if c < 3 else dpos[a]
            dpj_ref[a * 4 + c] += _dot3(dblend, w, _C0_0)  # (TB, J)


def _recon_cached_bwd(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm, weights_pad,
                      layout, graw, gst, gsa, omega=None, interpret=False):
    _, v_t, B = tgt_vm.shape
    v_pad = sd_cm.shape[1]
    J = pm.shape[0]
    Jw = weights_pad.shape[1]
    E = x_cols.shape[0]
    jp_l, jr = layout.jp, layout.jr
    tb = _shrink_tb(
        pick_batch_tile(B),
        # 12·VC input/output blocks + ~21·VC in-kernel scratch (blend, dpos,
        # dh, tgt temporaries) per batch column, as in _rhs_cached_bwd.
        lambda t: (
            33 * VC + 12 * layout.nt * jp_l + 2 * E + 15 * J + 12 * Jw
        ) * t + VC * (layout.nt * jr + Jw + 3 * E + J),
    )
    vc = _bwd_vc(B, tb)
    nchunks = v_pad // vc
    grid = (B // tb, nchunks)
    pjp = pack_pj(pj_cm, layout)
    weighted = omega is not None
    subset = not layout.full

    in_specs = ([_starts_spec(nchunks)] if subset else []) + [
        pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((12, layout.nt * jp_l, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((E, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((vc, layout.nt * jr), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((vc, Jw), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, vc, E), lambda i, k: (0, k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((J, vc), lambda i, k: (0, k), memory_space=pltpu.VMEM),
    ]
    operands = ([_starts_at(layout, vc)] if subset else []) + [
        tgt_vm, pjp, x_cols, layout.wtsp_sub, weights_pad, sd_cm, homog_vm, pm]
    if weighted:
        in_specs.append(
            pl.BlockSpec((vc, 1), lambda i, k: (k, 0), memory_space=pltpu.VMEM)
        )
        operands.append(omega)
    in_specs += [
        pl.BlockSpec((9, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, J, tb), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
    ]
    operands += [graw, gst, gsa]

    dtgt, dpj, dx, dh = pl.pallas_call(
        functools.partial(_recon_cached_bwd_kernel, layout.nt, nchunks, v_t % vc, E,
                          weighted, subset),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((12, tb, Jw), lambda i, k: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, tb), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vc, tb), lambda i, k: (0, k, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, v_t, B), jnp.float32),
            jax.ShapeDtypeStruct((12, B, Jw), jnp.float32),
            jax.ShapeDtypeStruct((E, B), jnp.float32),
            jax.ShapeDtypeStruct((3, v_pad, B), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return dtgt, jnp.transpose(dpj, (0, 2, 1)), dx, dh


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _recon_cached_diff(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm, weights_pad,
                       layout, interpret):
    return _recon_cached_impl(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                              layout, interpret=interpret)


def _recon_cached_fwd(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm, weights_pad,
                      layout, interpret):
    out = _recon_cached_impl(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                             layout, interpret=interpret)
    return out, (tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm, weights_pad,
                 layout)


def _recon_cached_bwd_rule(interpret, res, g):
    tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm, weights_pad, layout = res
    graw, gst, gsa = g
    dtgt, dpj, dx, dh = _recon_cached_bwd(
        tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm, weights_pad, layout,
        graw, gst, gsa, interpret=interpret,
    )
    return (dtgt, dpj, dx, jnp.zeros_like(sd_cm), dh, jnp.zeros_like(pm),
            jnp.zeros_like(weights_pad), jax.tree.map(jnp.zeros_like, layout))


_recon_cached_diff.defvjp(_recon_cached_fwd, _recon_cached_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _recon_cached_w_diff(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                         weights_pad, layout, omega, interpret):
    return _recon_cached_impl(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                              layout, omega=omega, interpret=interpret)


def _recon_cached_w_fwd(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                        weights_pad, layout, omega, interpret):
    out = _recon_cached_impl(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                             layout, omega=omega, interpret=interpret)
    return out, (tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm, weights_pad,
                 layout, omega)


def _recon_cached_w_bwd_rule(interpret, res, g):
    (tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm, weights_pad, layout,
     omega) = res
    graw, gst, gsa = g
    dtgt, dpj, dx, dh = _recon_cached_bwd(
        tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm, weights_pad, layout,
        graw, gst, gsa, omega=omega, interpret=interpret,
    )
    return (dtgt, dpj, dx, jnp.zeros_like(sd_cm), dh, jnp.zeros_like(pm),
            jnp.zeros_like(weights_pad), jax.tree.map(jnp.zeros_like, layout),
            jnp.zeros_like(omega))


_recon_cached_w_diff.defvjp(_recon_cached_w_fwd, _recon_cached_w_bwd_rule)


@functools.partial(jax.jit, static_argnames=('interpret',))
def recon_part_sums_cached_lm(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                              weights_pad, omega=None, interpret: bool = False,
                              layout: BlendLayout | None = None):
    """Lane-major recon+part-sums from a CACHED posed template (see the
    section comment): same outputs as :func:`recon_part_sums_lm`. ``x_cols``
    (E, B) is the solved beta step; ``homog_vm`` the cached posed template
    (emitted by the rhs kernel or computed by :func:`posed_template_lm`).
    ``omega``: None, the static (V_pad, 1) column, or a runtime (V, B)
    operand (that last variant carries no custom VJP)."""
    if layout is None:
        layout = default_layout(weights_pad, VC)
    if omega is None:
        return _recon_cached_diff(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                                  weights_pad, layout, interpret)
    if _runtime_omega(omega):
        # Per-call (V, B) ω: no custom VJP (runtime-weighted fits follow
        # ``autodiff_policy`` onto the XLA formulation under grad traces).
        return _recon_cached_impl(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                                  layout, omega=omega, interpret=interpret)
    return _recon_cached_w_diff(tgt_vm, pj_cm, x_cols, sd_cm, homog_vm, pm,
                                weights_pad, layout, omega, interpret)
