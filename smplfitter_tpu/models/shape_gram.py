"""Moment-tensor shape solve: the TPU-native fast path of ``fit_shape``.

The general shape solve (models/bodyfitter.py:fit_shape) materializes the
stacked beta-Jacobian design matrix — a (B, V, 3, S+1) tensor (≈3.5 GB at
batch 4096) written and re-read several times. On TPU that is pure HBM
bandwidth waste: the Jacobian has LOW-RANK STRUCTURE in the joints,

    jac_v = R̄_v · SD_v + T̄_v,   R̄_v = Σ_j w_vj R_j,   T̄_v = Σ_j w_vj T_j,

so every vertex-summed quantity of the normal equations factors through
joint-pair MOMENTS of the (static) skinning weights and shape directions:

    G = Σ_v jac_vᵀ jac_v = Σ_{j,k} (R_jᵀR_k) : Ksd[j,k] + cross(Lsd) + q ⊙ TᵀT

with Ksd/Lsd/q precomputed once per model. The per-call cost collapses to a
few small einsums plus ONE large MXU GEMM for the target-dependent right-hand
side — no (B, V, S) tensor ever exists. The translation is eliminated jointly
(augmented [betas, scale, trans] system), which is algebraically identical to
the reference's weighted-mean centering (/root/reference/src/smplfitter/pt/
bodyfitter.py:976-993 solves the same system by explicit centering in f64;
the augmented formulation avoids the cancellation that forced f64 there).

Covers every fit_shape configuration except per-vertex runtime weights (which
break the static moments — those calls fall back to the general solve, like
the reference's gram/general split at pt/bodyfitter.py:922).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import lbs_kernels
from ..ops import rotation as rot_ops
from ..ops.lstsq import batch_reduce_sum, solve_spd_unrolled

_HI = jax.lax.Precision.HIGHEST


@struct.dataclass
class GramData:
    """Joint-pair moments of skinning weights x shape directions (per model)."""

    W1: jax.Array  # (J,)            Σ_v w_vj
    q: jax.Array  # (J, J)           Σ_v w_vj w_vk
    sd1: jax.Array  # (J, 3, E)      Σ_v w_vj SD_v
    Lsd: jax.Array  # (J, J, 3, E)   Σ_v w_vj w_vk SD_v
    Ksd: jax.Array  # (J*J*9, E*E)   Σ_v w_vj w_vk SD_v ⊗ SD_v (flattened)
    Msd: jax.Array  # (V, J*3*E)     w_vj SD_v[c,e]  — rhs GEMM operand
    v_template4: jax.Array  # (V, 4)  template with homogeneous 1 channel
    posedirs4: jax.Array  # (V, 4, P) pose correctives, zero homogeneous row
    sd4: jax.Array  # (V, 4, E)      shape dirs (+kid), zero homogeneous row
    # Padded vertex-major operands for the fused Pallas kernels:
    weights_pad: jax.Array  # (V_pad, J)
    consts_pose: jax.Array  # (4, V_pad, P207+1): [posedirs4 | v_template4]
    consts_full: jax.Array  # (4, V_pad, P207+1+E): [... | sd4]
    sd_cm: jax.Array  # (3, V_pad, E)   shape dirs, component-major (rhs kernel)
    # Gram-assembly kernel statics (batch-lane-major row orders):
    Lz_e: jax.Array  # (J*3, E*J)  Lsd with rows (j,c), cols (e,k)
    sd1_2d: jax.Array  # (J*3, E)  sd1 flattened (j,c)-major
    W1_col: jax.Array  # (J, 1)
    # First moments of the full const features (rows match consts_full's
    # columns [posedirs | v_template | sd]): lets Σ_v ω_v rec_v be contracted
    # from per-joint moments without materializing the mesh (known-shape trans).
    Kc: jax.Array  # (J, 3, P207+1+E)  Σ_v [ω_v] w_vj consts_v
    n_ext: int = struct.field(pytree_node=False)  # E = n_betas (+1 if kid)
    # Static per-vertex fit weights ω (None = unweighted). When set, all the
    # moment fields above are ω-weighted sums and the kernels weight the
    # target-side reductions through ``omega_pad`` (one exact VPU multiply on
    # the residual — see ops/lbs_kernels.py). The big per-vertex operands
    # (Msd, consts_*, weights_pad, sd_cm) stay UNWEIGHTED: ω reaches the
    # right-hand side via the residual, never via the operands.
    omega_pad: Optional[jax.Array] = None  # (V_pad, 1) or None
    omega: Optional[jax.Array] = None  # (V,) or None
    w_total: float = struct.field(pytree_node=False, default=0.0)  # Σ_v ω_v
    # Joint-subset blend layouts (ops/chunk_layout.py): when set, ALL the
    # padded kernel operand fields above are in the layout's VERTEX order and
    # kernels slice the j-major K-packed joint operands per chunk. None =
    # canonical order, full-width packing (the degenerate path).
    blend_layout: Optional[lbs_kernels.BlendLayout] = None  # VC-chunk kernels
    blend_layout_w: Optional[lbs_kernels.BlendLayout] = None  # VC_W (wgram)
    vperm: Optional[tuple] = struct.field(pytree_node=False, default=None)
    Msd_vm: Optional[jax.Array] = None  # (V, J*3*E) Msd in vperm order


def build_gram_data(weights: np.ndarray, shapedirs: np.ndarray,
                    kid_shapedir: Optional[np.ndarray], n_betas: int,
                    v_template: np.ndarray, posedirs: np.ndarray,
                    vertex_weights: Optional[np.ndarray] = None,
                    dtype=jnp.float32,
                    kintree_parents=None,
                    sort_vertices: bool = False) -> GramData:
    """Host-side (f64) moment precompute. ``weights`` (V, J), ``shapedirs``
    (V, 3, S); kid column appended when ``kid_shapedir`` is given.
    ``vertex_weights`` (V,) bakes static per-vertex fit weights into the
    quadratic moments (the fast path for fitter-level weights, e.g. the
    HandReplacer's down-weighted hands — cf. the reference's runtime-weighted
    general solve, /root/reference/src/smplfitter/np/bodyfitter.py:758-766)."""
    w = np.asarray(weights, np.float64)
    SD = np.asarray(shapedirs, np.float64)[:, :, :n_betas]
    if kid_shapedir is not None:
        SD = np.concatenate([SD, np.asarray(kid_shapedir, np.float64)[:, :, None]], axis=2)
    V, J = w.shape
    E = SD.shape[2]
    omega = (
        None
        if vertex_weights is None
        else np.asarray(vertex_weights, np.float64).reshape(V)
    )
    # ω enters every quadratic moment exactly once (it weights the vertex sum).
    w_omega = w if omega is None else w * omega[:, None]

    # Homogeneous-channel constants: activations come out of their producer
    # GEMMs already 4-wide ([x y z 1] / [x y z 0]), so no runtime pad/concat
    # of (B, V, .) tensors is needed for the [R|t] LBS form.
    v_template4 = np.concatenate([np.asarray(v_template), np.ones((V, 1))], axis=1)
    posedirs4 = np.concatenate(
        [np.asarray(posedirs), np.zeros((V, 1, posedirs.shape[2]))], axis=1
    )
    sd4 = np.concatenate([SD, np.zeros((V, 1, E))], axis=1)

    # Vertex-major padded kernel operands (pad rows are zero => padding
    # vertices contribute nothing anywhere). When the kinematic tree is
    # available, they are built in the chunk layout's vertex order and carry
    # joint-subset blend layouts (see ops/chunk_layout.py) — vertex sums are
    # order-invariant, and the fitter permutes targets during their one
    # component-major relayout.
    from ..ops import chunk_layout as _cl

    vc = lbs_kernels.VC
    v_pad = -(-V // vc) * vc
    n_pose = posedirs4.shape[2]

    vc_w = lbs_kernels.wgram_chunk(J)
    if kintree_parents is not None:
        cl_main = _cl.build_chunk_layout(w, kintree_parents, vc,
                                         sort_vertices=sort_vertices)
        cl_w = _cl.build_chunk_layout(w, kintree_parents, vc_w,
                                      sort_vertices=sort_vertices)
    else:
        cl_main = _cl.identity_layout(V, J, vc)
        cl_w = _cl.identity_layout(V, J, vc_w)
    vperm = cl_main.vperm

    def make_layout(cl):
        if cl.degenerate and cl_main.degenerate:
            return None
        wtsp_sub, w_sub, starts = _cl.build_blend_operands(w, cl, v_pad)
        return lbs_kernels.BlendLayout(
            wtsp_sub=jnp.asarray(wtsp_sub, dtype),
            w_sub=jnp.asarray(w_sub, dtype),
            starts=jnp.asarray(starts),
            jr=cl.jr, jp=cl.jp, jperm=tuple(int(x) for x in cl.jperm),
        )

    blend_layout = make_layout(cl_main)
    permuted = blend_layout is not None
    if not permuted:
        vperm = np.arange(V)
    blend_layout_w = make_layout(cl_w) if permuted else None
    nontrivial_vperm = permuted and not np.array_equal(vperm, np.arange(V))

    def pad_rows(x):
        x = x[vperm]
        return np.concatenate([x, np.zeros((v_pad - V,) + x.shape[1:])], axis=0)

    weights_pad = pad_rows(w)
    # Component-major (4, V_pad, F) for the kernels' per-channel 2D dots.
    consts_pose = pad_rows(
        np.concatenate([posedirs4, v_template4[:, :, None]], axis=2)
    ).transpose(1, 0, 2)
    consts_full = pad_rows(
        np.concatenate([posedirs4, v_template4[:, :, None], sd4], axis=2)
    ).transpose(1, 0, 2)

    # Msd[v, (j,c,e)] = w_vj SD_v[c,e]
    Msd = (w[:, :, None, None] * SD[:, None, :, :]).reshape(V, J * 3 * E)
    sd_cm = pad_rows(SD).transpose(1, 0, 2)  # (3, V_pad, E)
    # Ksd regrouped to row order ((j,c),(k,d)) matching X = R2ᵀR2 with
    # R2[b, a, (j,c)] — term1 is then ONE (B, 5184) x (5184, E*E) GEMM with no
    # 5-D intermediate formatting.
    Msd_w = Msd if omega is None else Msd * omega[:, None]
    K = Msd.T @ Msd_w  # (J3E, J3E)
    K = K.reshape(J, 3, E, J, 3, E)
    Ksd = K.transpose(0, 1, 3, 4, 2, 5).reshape(J * 3 * J * 3, E * E)
    # Lsd[j,k,c,e] = Σ_v [ω_v] w_vk Msd[v,(j,c,e)]
    Lsd = (Msd.T @ w_omega).reshape(J, 3, E, J).transpose(0, 3, 1, 2)
    sd1 = np.einsum('vj,vce->jce', w_omega, SD)
    q = w.T @ w_omega
    W1 = w_omega.sum(axis=0)
    w_total = float(V) if omega is None else float(omega.sum())
    consts3 = np.concatenate(
        [np.asarray(posedirs, np.float64),
         np.asarray(v_template, np.float64)[:, :, None], SD], axis=2
    )  # (V, 3, F) — same column order as consts_full
    Kc = (w_omega.T @ consts3.reshape(V, -1)).reshape(J, 3, consts3.shape[2])

    return GramData(
        W1=jnp.asarray(W1, dtype),
        q=jnp.asarray(q, dtype),
        sd1=jnp.asarray(sd1, dtype),
        Lsd=jnp.asarray(Lsd, dtype),
        Ksd=jnp.asarray(Ksd, dtype),
        Msd=jnp.asarray(Msd, dtype),
        v_template4=jnp.asarray(v_template4, dtype),
        posedirs4=jnp.asarray(posedirs4, dtype),
        sd4=jnp.asarray(sd4, dtype),
        weights_pad=jnp.asarray(weights_pad, dtype),
        consts_pose=jnp.asarray(consts_pose, dtype),
        consts_full=jnp.asarray(consts_full, dtype),
        sd_cm=jnp.asarray(sd_cm, dtype),
        Lz_e=jnp.asarray(
            np.transpose(Lsd, (0, 2, 3, 1)).reshape(J * 3, E * J), dtype
        ),
        sd1_2d=jnp.asarray(sd1.reshape(J * 3, E), dtype),
        W1_col=jnp.asarray(W1.reshape(J, 1), dtype),
        Kc=jnp.asarray(Kc, dtype),
        n_ext=E,
        omega_pad=(
            None if omega is None
            else jnp.asarray(pad_rows(omega.reshape(V, 1)), dtype)
        ),
        omega=None if omega is None else jnp.asarray(omega, dtype),
        w_total=w_total,
        blend_layout=blend_layout,
        blend_layout_w=blend_layout_w,
        # None when the layout keeps canonical vertex order (the default):
        # ingestion then skips the permutation gathers entirely.
        vperm=tuple(int(x) for x in vperm) if nontrivial_vperm else None,
        Msd_vm=jnp.asarray(Msd[vperm], dtype) if nontrivial_vperm else None,
    )


def _vertex_moment_rhs(gram: GramData, field):
    """Y[b, j, c, e, a] = Σ_v w_vj SD_v[c,e] field_v[a] — the one large MXU GEMM
    of the shape solve (everything else is per-instance small contractions)."""
    B = field.shape[0]
    J = gram.q.shape[0]
    E = gram.n_ext
    Y = jnp.einsum('vp,bva->bpa', gram.Msd, field, precision=_HI)
    return Y.reshape(B, J, 3, E, 3)


def fit_shape_gram(
    bm,
    plan,
    gram: GramData,
    glob_rotmats: jax.Array,
    target_vertices: jax.Array,
    target_joints: Optional[jax.Array],
    joint_weights: Optional[jax.Array],
    beta_regularizer: float,
    beta_regularizer2: float,
    scale_regularizer: float,
    kid_regularizer: Optional[float],
    share_beta: bool,
    scale_target: bool,
    scale_fit: bool,
    beta_regularizer_reference,
    kid_regularizer_reference,
    requested_keys=(),
    target_vm=None,
    batch_mask=None,
) -> dict:
    """Drop-in replacement for the vertex block of ``fit_shape`` (no per-vertex
    runtime weights). Returns the same result dict."""
    from .bodyfitter import fk_positions_ext  # local import to avoid cycle

    if scale_target and scale_fit:
        raise ValueError('Only one of scale_target and scale_fit can be True')
    if gram.omega_pad is not None:
        raise ValueError(
            'static-weighted GramData is only supported by the lane-major '
            'solve (fit_shape_gram_lm); the batch-major configurations '
            'materialize per-call weights instead'
        )

    batch = target_vertices.shape[0]
    J = bm.num_joints
    E = gram.n_ext
    n_betas = plan.n_betas
    dtype = target_vertices.dtype
    parent_indices = np.array(bm.kintree_parents[1:])

    parent_glob = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), (batch, 1, 3, 3)),
            glob_rotmats[:, parent_indices],
        ],
        axis=1,
    )
    rel_rotmats = rot_ops.matmul3x3(parent_glob, glob_rotmats, transpose_a=True)

    # FK of extended joint positions; split into position and Jacobian columns.
    pos_ext = fk_positions_ext(bm, plan, glob_rotmats)  # (B, J, 3, 1+E)
    p_j = pos_ext[..., 0]  # (B, J, 3)
    P_j = pos_ext[..., 1:]  # (B, J, 3, E)
    jte = plan.J_template_ext[..., 0]  # (J, 3)
    JTE = plan.J_template_ext[..., 1:]  # (J, 3, E)
    t_j = p_j - rot_ops.matvec3(glob_rotmats, jte)
    # T is kept component-major (B, 3, J, E): every quadratic contraction below
    # pairs it with rotation data in the same (component, joint) order, so no
    # relayout copies appear between the producers and the batched Gram GEMMs.
    T_perm = jnp.transpose(P_j, (0, 2, 1, 3)) - jnp.stack(
        [
            sum(glob_rotmats[:, :, a, c, None] * JTE[None, :, c, :] for c in range(3))
            for a in range(3)
        ],
        axis=1,
    )  # (B, 3, J, E)

    scale_col = scale_target or scale_fit
    # Fused-kernel path: all per-vertex work (extended LBS, residuals, moment
    # reductions) runs inside vertex-major Pallas kernels — no (B, V, .) HBM
    # intermediates. Scale columns ride it too: the kernel emits the
    # target-side column moments and the pos side follows by linearity.
    k_mode = lbs_kernels.kernel_mode(batch)
    interp = k_mode == 'interpret'
    rot_params = rel_rotmats[:, 1:].reshape(batch, (J - 1) * 9)

    if k_mode is not None:
        v_pad = gram.weights_pad.shape[0]
        tgt_vm = (
            target_vm
            if target_vm is not None
            else lbs_kernels.to_vertex_major(target_vertices, perm=gram.vperm)
        )
        # (B, J, 3, 4) -> (12=(a,c4), J, B)
        pj_cm = jnp.transpose(
            jnp.concatenate([glob_rotmats, t_j[..., None]], axis=3), (2, 3, 1, 0)
        ).reshape(12, J, batch)
        feat_cols = jnp.concatenate(
            [rot_params, jnp.ones((batch, 1), dtype)], axis=1
        ).T
        if scale_col:
            rk, yk, rtk, ytk, sck = lbs_kernels.rhs_moments(
                tgt_vm, pj_cm, feat_cols, gram.weights_pad, gram.consts_pose,
                gram.sd_cm, scale=True, interpret=interp,
                layout=gram.blend_layout,
            )
        else:
            rk, yk = lbs_kernels.rhs_moments(
                tgt_vm, pj_cm, feat_cols, gram.weights_pad, gram.consts_pose,
                gram.sd_cm, interpret=interp, layout=gram.blend_layout,
            )
    else:
        # Per-vertex position at beta=0: LBS in homogeneous form. The posed
        # template comes out of its producer GEMM already as [x y z 1] (the
        # homogeneous channel is baked into the constants).
        homog = gram.v_template4 + jnp.einsum(
            'vcp,bp->bvc', gram.posedirs4, rot_params, precision=_HI
        )
        per_joint = jnp.concatenate(
            [glob_rotmats, t_j[..., None]], axis=3
        ).reshape(batch, J, 12)
        blended = jnp.einsum('vj,bjx->bvx', bm.weights, per_joint, precision=_HI)
        blended = blended.reshape(batch, -1, 3, 4)
        pos = jnp.einsum('bvac,bvc->bva', blended, homog, precision=_HI)
        b = target_vertices - pos  # (B, V, 3)

    # --- Gramian of the vertex block through the joint-pair moments ---
    # Fast path: ONE batch-tile Pallas kernel assembles every per-instance
    # quadratic form (term1, sym(Z^T T), (qT)^T T, joints block, SA, rhs
    # moments) with batch in lanes — no (B, 3J, 3J) HBM intermediates. Large
    # models stream Ksd through a second grid axis (lbs_kernels._gram_xblock),
    # so the kernel covers every SMPL-family J; the XLA assembly below is the
    # CPU/no-kernel fallback (on SMPL-X it materializes a 446 MB X
    # intermediate at b4096 — measured ~30 ms of the 82 ms fit before the
    # blocked kernel replaced it).
    use_gram_kernel = k_mode is not None
    if use_gram_kernel:
        has_joints = target_joints is not None
        R_cm = jnp.transpose(glob_rotmats, (2, 1, 3, 0)).reshape(3, J * 3, batch)
        T_cm = jnp.transpose(T_perm, (1, 3, 2, 0)).reshape(3, E * J, batch)
        if has_joints:
            P_cm = jnp.transpose(P_j, (2, 3, 1, 0)).reshape(3, E * J, batch)
            bJ_cm = jnp.transpose(target_joints - p_j, (2, 1, 0))
        else:
            P_cm = jnp.zeros((3, 1, batch), dtype)
            bJ_cm = jnp.zeros((3, 1, batch), dtype)
        Gk, SAk, rbk, Sbk = lbs_kernels.gram_assembly(
            R_cm, T_cm, yk, P_cm, bJ_cm, gram.Ksd, gram.Lz_e, gram.sd1_2d,
            gram.q, gram.W1_col, has_joints=has_joints, interpret=interp,
        )
        G = Gk.T.reshape(batch, E, E)
        SA = SAk.T.reshape(batch, 3, E)
        r = rk.T + rbk.T
        Sb = Sbk.T
        W = jnp.full(
            (batch,), float(bm.num_vertices) + (J if has_joints else 0), dtype
        )
    else:
        # X[(j,c),(k,d)] = Σ_a R[a,(j,c)] R[a,(k,d)] as a fused elementwise
        # outer-product reduction (a K=3 batched matmul would relayout on the MXU).
        R2 = jnp.transpose(glob_rotmats, (0, 2, 1, 3)).reshape(batch, 3, J * 3)
        X = jnp.sum(R2[:, :, :, None] * R2[:, :, None, :], axis=1)  # (B, 3J, 3J)
        term1 = (
            X.reshape(batch, J * 3 * J * 3) @ gram.Ksd
        ).reshape(batch, E, E)
        # Z[b, a, (k,e)] = R2 @ Lsd reordered to ((j,c), (k,e)): one clean GEMM.
        Lsd2 = jnp.transpose(gram.Lsd, (0, 2, 1, 3)).reshape(J * 3, J * E)
        Z = (R2.reshape(batch * 3, J * 3) @ Lsd2).reshape(batch, 3, J, E)
        Zq = jnp.einsum('jk,bake->baje', gram.q, T_perm, precision=_HI)
        # All remaining Gramian pieces are U^T V products over a (3*J)-sized axis.
        # Batch them into ONE GEMM and symmetrize once: with Zq/2 in U (its
        # product with T is already symmetric), M + M^T yields
        # sym(Z^T T) + T^T q T (+ the joints block, appended below).
        U_blocks = [Z.reshape(batch, 3 * J, E), 0.5 * Zq.reshape(batch, 3 * J, E)]
        V_blocks = [T_perm.reshape(batch, 3 * J, E)] * 2

        SA = (
            jnp.einsum('bjac,jce->bae', glob_rotmats, gram.sd1, precision=_HI)
            + jnp.einsum('j,baje->bae', gram.W1, T_perm, precision=_HI)
        )  # (B, 3, E)
        W = jnp.full((batch,), float(bm.num_vertices), dtype)

        if k_mode is not None:
            # The rotation part Σ_v (R̄ SD)ᵀ b comes straight out of the kernel;
            # only the joint-translation part T̄ᵀ b needs the (J-space) sums.
            # Σ_v b_v = Σ_j y_j (skinning weight rows sum to 1).
            Sb = jnp.sum(yk, axis=1).T  # yk is (3, J, B) -> (B, 3)
            partB = jnp.einsum('baje,ajb->be', T_perm, yk, precision=_HI)
            r = rk.T + partB
        else:
            Sb = jnp.sum(b, axis=1)  # (B, 3)

            # --- rhs via the single large moment GEMM ---
            def jac_dot(field):
                """Σ_v jac_vᵀ field_v  -> (B, E)."""
                Y = _vertex_moment_rhs(gram, field)  # (B, J, 3, E, 3)
                partA = jnp.einsum('bjac,bjcea->be', glob_rotmats, Y, precision=_HI)
                y = jnp.einsum('vj,bva->bja', bm.weights, field, precision=_HI)
                partB = jnp.einsum('baje,bja->be', T_perm, y, precision=_HI)
                return partA + partB, y

            r, y_b = jac_dot(b)

        # --- joints block (small, direct) ---
        if target_joints is not None:
            bJ = target_joints - p_j
            jw = joint_weights if joint_weights is not None else jnp.ones((batch, J), dtype)
            wjac = P_j * jw[..., None, None]
            U_blocks.append(0.5 * wjac.reshape(batch, J * 3, E))
            V_blocks.append(P_j.reshape(batch, J * 3, E))
            r = r + jnp.einsum('bjae,bja->be', wjac, bJ, precision=_HI)
            SA = SA + jnp.sum(wjac, axis=1)
            Sb = Sb + jnp.sum(bJ * jw[..., None], axis=1)
            W = W + jnp.sum(jw, axis=1)

        M = jnp.einsum(
            'bxe,bxf->bef',
            jnp.concatenate(U_blocks, axis=1),
            jnp.concatenate(V_blocks, axis=1),
            precision=_HI,
        )
        G = term1 + M + jnp.swapaxes(M, -1, -2)  # (B, E, E)

    # --- optional scale column ---
    if scale_col and k_mode is not None:
        # Column pieces from the kernel's target-side moments: for
        # scale_target the column is −tgt; for scale_fit it is the LBS
        # position pos = tgt − b, so every pos moment is a difference of the
        # target and residual moments already reduced in-kernel.
        rt = rtk.T + jnp.einsum('baje,ajb->be', T_perm, ytk, precision=_HI)
        r_b_vert = rk.T + jnp.einsum('baje,ajb->be', T_perm, yk, precision=_HI)
        sum_t = jnp.sum(ytk, axis=1).T  # (B, 3)
        sum_b = jnp.sum(yk, axis=1).T
        s_tt, s_tp, s_pp = sck[0], sck[1], sck[2]  # (B,) each
        if scale_target:
            g_cross = -rt
            col_sq = s_tt
            col_b = -(s_tt - s_tp)
            SA_col = -sum_t
        else:
            g_cross = rt - r_b_vert
            col_sq = s_pp
            col_b = s_tp - s_pp
            SA_col = sum_t - sum_b
        if target_joints is not None:
            # Joints terms (unweighted, matching the kernel-path joints
            # block in gram_assembly).
            bJs = target_joints - p_j
            col_joint = -target_joints if scale_target else p_j
            g_cross = g_cross + jnp.einsum(
                'bjae,bja->be', P_j, col_joint, precision=_HI
            )
            col_sq = col_sq + jnp.sum(col_joint * col_joint, axis=(1, 2))
            col_b = col_b + jnp.sum(col_joint * bJs, axis=(1, 2))
            SA_col = SA_col + jnp.sum(col_joint, axis=1)
    elif scale_col:
        if scale_target:
            col_vert = -target_vertices
            col_joint = -target_joints if target_joints is not None else None
        else:
            col_vert = pos
            col_joint = p_j if target_joints is not None else None
        g_cross, y_col = jac_dot(col_vert)  # (B, E)
        col_sq = jnp.sum(col_vert * col_vert, axis=(1, 2))
        col_b = jnp.sum(col_vert * b, axis=(1, 2))
        SA_col = jnp.sum(col_vert, axis=1)  # (B, 3)
        if col_joint is not None:
            jwj = jw[..., None]
            g_cross = g_cross + jnp.einsum(
                'bjae,bja->be', P_j * jwj[..., None], col_joint, precision=_HI
            )
            col_sq = col_sq + jnp.sum(col_joint * col_joint * jwj, axis=(1, 2))
            col_b = col_b + jnp.sum(col_joint * bJ * jwj, axis=(1, 2))
            SA_col = SA_col + jnp.sum(col_joint * jwj, axis=1)

    # --- regularizers ---
    l2 = jnp.concatenate(
        [
            jnp.full((2,), beta_regularizer2, dtype),
            jnp.full((n_betas - 2,), beta_regularizer, dtype),
        ]
    )
    if beta_regularizer_reference is None:
        l2_ref = jnp.zeros((batch, n_betas), dtype)
    else:
        ref = jnp.asarray(beta_regularizer_reference).astype(dtype)
        if ref.shape[1] < n_betas:
            ref = jnp.pad(ref, ((0, 0), (0, n_betas - ref.shape[1])))
        l2_ref = ref[:, :n_betas]
    if plan.enable_kid:
        if kid_regularizer is None:
            kid_regularizer = beta_regularizer
        l2 = jnp.concatenate([l2, jnp.full((1,), kid_regularizer, dtype)])
        if kid_regularizer_reference is None:
            kid_ref = jnp.zeros((batch, 1), dtype)
        else:
            kid_ref = jnp.asarray(kid_regularizer_reference).reshape(batch, 1).astype(dtype)
        l2_ref = jnp.concatenate([l2_ref, kid_ref], axis=1)
    if scale_col:
        l2 = jnp.concatenate([l2, jnp.full((1,), scale_regularizer, dtype)])
        l2_ref = jnp.concatenate([l2_ref, jnp.zeros((batch, 1), dtype)], axis=1)
    l2_rhs = l2 * l2_ref  # (B, P)
    if share_beta:
        # Reference identity-row semantics: shared pull is l2^2 * ref (see
        # _solve_tail).
        l2_rhs = l2 * l2_rhs

    # --- assemble the augmented [betas(+kid)(+scale), trans] system ---
    # Pure concatenation (scatter-assembly via .at[].set lowers to slow
    # dynamic-update-slices on TPU).
    P = E + (1 if scale_col else 0)
    eyeW = W[:, None, None] * jnp.eye(3, dtype=dtype)
    SAT = jnp.swapaxes(SA, -1, -2)
    if scale_col:
        row_b = jnp.concatenate([G, g_cross[:, :, None], SAT], axis=2)
        row_s = jnp.concatenate(
            [g_cross[:, None, :], col_sq[:, None, None], SA_col[:, None, :]], axis=2
        )
        row_t = jnp.concatenate([SA, SA_col[:, :, None], eyeW], axis=2)
        G_aug = jnp.concatenate([row_b, row_s, row_t], axis=1)
        r_aug = jnp.concatenate(
            [r + l2_rhs[:, :E], col_b[:, None] + l2_rhs[:, E:], Sb], axis=1
        )
    else:
        row_b = jnp.concatenate([G, SAT], axis=2)
        row_t = jnp.concatenate([SA, eyeW], axis=2)
        G_aug = jnp.concatenate([row_b, row_t], axis=1)
        r_aug = jnp.concatenate([r + l2_rhs, Sb], axis=1)
    G_aug = G_aug + jnp.diag(jnp.concatenate([l2, jnp.zeros((3,), dtype)]))

    if share_beta:
        sol = _solve_partial_share(G_aug, r_aug, n_shared=E, batch_mask=batch_mask)
    else:
        sol = solve_spd_unrolled(G_aug, r_aug)

    new_shape = sol[:, :n_betas]
    new_kid_factor = sol[:, n_betas] if plan.enable_kid else None
    new_scale_corr = sol[:, E] + 1 if scale_col else None
    new_trans = sol[:, P:]

    if scale_fit:
        new_shape = new_shape / new_scale_corr[..., None]
        if new_kid_factor is not None:
            new_kid_factor = new_kid_factor / new_scale_corr

    result = dict(
        shape_betas=new_shape,
        kid_factor=new_kid_factor,
        trans=new_trans,
        relative_orientations=rel_rotmats,
        scale_corr=new_scale_corr,
        joints=None,
        vertices=None,
    )

    # Reconstruction uses the scale-divided betas, matching the general solve
    # (and the reference, np/bodyfitter.py:836-868).
    full_x = new_shape
    if plan.enable_kid:
        full_x = jnp.concatenate([full_x, new_kid_factor[:, None]], axis=1)
    if 'joints' in requested_keys:
        result['joints'] = (
            p_j
            + jnp.einsum('bjae,be->bja', P_j, full_x, precision=_HI)
            + new_trans[:, None]
        )
    recon_requested = (
        'vertices' in requested_keys
        or 'vertices_vm' in requested_keys
        or 'recon_spec' in requested_keys
    )
    if recon_requested:
        if k_mode is not None:
            # One extended-LBS kernel pass reconstructs pos + jac·x + trans:
            # the beta step folds into the homogeneous features [f; 1; x], the
            # joint translation absorbs T_j x and the global translation.
            t2 = (
                t_j
                + jnp.einsum('baje,be->bja', T_perm, full_x, precision=_HI)
                + new_trans[:, None]
            )
            pj2_cm = jnp.transpose(
                jnp.concatenate([glob_rotmats, t2[..., None]], axis=3), (2, 3, 1, 0)
            ).reshape(12, J, batch)
            f2_cols = jnp.concatenate(
                [rot_params, jnp.ones((batch, 1), dtype), full_x], axis=1
            ).T
            if 'recon_spec' in requested_keys:
                # Deferred reconstruction: downstream part-sum consumers run
                # the fused recon_part_sums kernel from these operands, so the
                # mesh itself never needs to be materialized in HBM.
                result['recon_spec'] = dict(
                    pj_cm=pj2_cm, feat_cols=f2_cols,
                    weights_pad=gram.weights_pad, consts_pad=gram.consts_full,
                    interpret=interp, layout=gram.blend_layout,
                )
            if 'vertices_vm' in requested_keys or 'vertices' in requested_keys:
                recon_vm = lbs_kernels.lbs_points(
                    pj2_cm, f2_cols, gram.weights_pad, gram.consts_full,
                    interpret=interp, layout=gram.blend_layout,
                )
                if 'vertices_vm' in requested_keys:
                    result['vertices_vm'] = recon_vm
                if 'vertices' in requested_keys:
                    result['vertices'] = lbs_kernels.from_vertex_major(
                        recon_vm, bm.num_vertices, perm=gram.vperm
                    )
        else:
            # vertices = pos + jac·x + trans, jac·x = R̄ (SD x) + skin(T x).
            # R̄ u rides the homogeneous blend: sd4's zero homogeneous row
            # makes u come out of its GEMM as [x y z 0].
            u_h = jnp.einsum('vce,be->bvc', gram.sd4, full_x, precision=_HI)
            tx = jnp.einsum('baje,be->bja', T_perm, full_x, precision=_HI)
            result['vertices'] = (
                pos
                + jnp.einsum('bvac,bvc->bva', blended, u_h, precision=_HI)
                + jnp.einsum('vj,bja->bva', bm.weights, tx, precision=_HI)
                + new_trans[:, None]
            )
    return result


def _sd_ext(bm, plan):
    if plan.enable_kid:
        return jnp.concatenate(
            [bm.shapedirs[:, :, : plan.n_betas], bm.kid_shapedir[:, :, None]], axis=2
        )
    return bm.shapedirs[:, :, : plan.n_betas]


def _solve_partial_share(G_aug: jax.Array, r_aug: jax.Array, n_shared: int,
                         batch_mask: Optional[jax.Array] = None) -> jax.Array:
    """Gramian-level block elimination: first ``n_shared`` params shared
    batch-wide, the rest per-instance. The shared-Schur sums over the batch are
    THE cross-device all-reduce under batch sharding.

    ``batch_mask`` (B,) zeroes selected instances' contributions to the shared
    sums — the exactness device behind batch-tile PADDING of share_beta fits
    (replicate-padded instances carry mask 0; their per-instance solves run on
    well-conditioned data and are discarded)."""
    Gss = G_aug[:, :n_shared, :n_shared]
    Gsi = G_aug[:, :n_shared, n_shared:]
    Gii = G_aug[:, n_shared:, n_shared:]
    rs = r_aug[:, :n_shared]
    ri = r_aug[:, n_shared:]

    Ci = solve_spd_unrolled(Gii, jnp.swapaxes(Gsi, -1, -2))  # (B, ni, ns)
    di = solve_spd_unrolled(Gii, ri)  # (B, ni)

    schur_contrib = Gss - Gsi @ Ci
    moment_contrib = rs - jnp.einsum('bse,be->bs', Gsi, di, precision=_HI)
    if batch_mask is not None:
        schur_contrib = schur_contrib * batch_mask[:, None, None]
        moment_contrib = moment_contrib * batch_mask[:, None]
    S = batch_reduce_sum(schur_contrib, axis=0)
    rhs_s = batch_reduce_sum(moment_contrib, axis=0)
    xs = solve_spd_unrolled(S[None], rhs_s[None])[0]  # (ns,)

    xi = di - jnp.einsum('bis,s->bi', Ci, xs)
    batch = G_aug.shape[0]
    xs_b = jnp.broadcast_to(xs, (batch, n_shared))
    return jnp.concatenate([xs_b, xi], axis=1)


def fit_shape_gram_lm(
    bm,
    plan,
    gram: GramData,
    glob_lm: jax.Array,
    tgt_vm: jax.Array,
    tj_lm: Optional[jax.Array],
    beta_regularizer: float,
    beta_regularizer2: float,
    kid_regularizer: Optional[float],
    share_beta: bool,
    beta_regularizer_reference,
    kid_regularizer_reference,
    requested_keys=(),
    jw_static: Optional[np.ndarray] = None,
    interpret: bool = False,
    batch_mask: Optional[jax.Array] = None,
    scale_target: bool = False,
    scale_fit: bool = False,
    scale_regularizer: float = 0.0,
) -> dict:
    """Lane-major shape solve: rotations as (9, J, B) entries, targets
    component-major, per-joint operands built by leading-dim stacks/concats —
    no (B, J, 3, 3)-layout relayouts anywhere on the hot path. Covers the
    fused-kernel configurations (no per-call per-vertex weights); everything
    else goes through :func:`fit_shape_gram`. ``scale_target``/``scale_fit``
    add the scale column from the kernel's target-side moments
    (``rhs_moments(scale=True)``; pos side by linearity) — reference column
    semantics /root/reference/src/smplfitter/np/bodyfitter.py:751-757.

    Static fit weights: a ω-weighted ``gram`` (see :func:`build_gram_data`)
    makes the vertex block weighted; ``jw_static`` (host (J,) array) weights
    the joints block, which is then assembled in XLA outside the gram kernel.

    Returns the usual result dict plus lane-major extras: ``joints_lm``
    (3, J, B) and ``trans_lm`` (3, B); ``relative_orientations_lm`` (9, J, B).
    """
    batch = glob_lm.shape[2]
    J = bm.num_joints
    E = gram.n_ext
    scale_col = scale_target or scale_fit
    dtype = tgt_vm.dtype
    has_joints = tj_lm is not None
    # Static joint weights take the joints block out of the assembly kernel
    # (which only knows the unweighted form) into small XLA einsums below.
    weighted_joints = has_joints and jw_static is not None
    kernel_joints = has_joints and not weighted_joints
    w_base = gram.w_total if gram.w_total else float(bm.num_vertices)

    pre = _fk_ext_prelude(bm, plan, glob_lm, dtype)
    rel9, rot_params_cols = pre['rel9'], pre['rot_params_cols']
    p_j, P4, t_lm, T4 = pre['p_j'], pre['P4'], pre['t_lm'], pre['T4']
    pj_cm, feat_cols = pre['pj_cm'], pre['feat_cols']
    # The deferred-recon consumers reuse the posed template computed here
    # (the homog cache). Small-F models emit it from the rhs kernel when a
    # recon spec is requested (scale solves keep the plain kernel; their
    # extra outputs already crowd VMEM); large-F models compute it as a
    # standalone GEMM and run the cached rhs kernel in EVERY configuration.
    homog_vm = None
    want_recon = 'recon_spec' in requested_keys
    if gram.consts_pose.shape[2] > lbs_kernels.HOMOG_GEMM_MIN_F:
        # Large-F pipeline: posed template once per iteration as a standalone
        # GEMM; the rhs kernel reads it instead of re-streaming the
        # (4, V_pad, F) constants per batch tile (and gets its batch tile
        # back to 256 — the F operands were what forced the VMEM shrink).
        homog_vm = lbs_kernels.posed_template_lm(feat_cols, gram.consts_pose,
                                                 interpret)
        if scale_col:
            rk, yk, rtk, ytk, sck = lbs_kernels.rhs_moments_cached(
                tgt_vm, pj_cm, homog_vm, gram.weights_pad, gram.sd_cm,
                omega=gram.omega_pad, scale=True, interpret=interpret,
                layout=gram.blend_layout,
            )
        else:
            rk, yk = lbs_kernels.rhs_moments_cached(
                tgt_vm, pj_cm, homog_vm, gram.weights_pad, gram.sd_cm,
                omega=gram.omega_pad, interpret=interpret,
                layout=gram.blend_layout,
            )
    elif scale_col:
        rk, yk, rtk, ytk, sck = lbs_kernels.rhs_moments(
            tgt_vm, pj_cm, feat_cols, gram.weights_pad, gram.consts_pose,
            gram.sd_cm, omega=gram.omega_pad, scale=True, interpret=interpret,
            layout=gram.blend_layout,
        )
    elif want_recon:
        rk, yk, homog_vm = lbs_kernels.rhs_moments_h(
            tgt_vm, pj_cm, feat_cols, gram.weights_pad, gram.consts_pose,
            gram.sd_cm, omega=gram.omega_pad, interpret=interpret,
            layout=gram.blend_layout,
        )
    else:
        rk, yk = lbs_kernels.rhs_moments(
            tgt_vm, pj_cm, feat_cols, gram.weights_pad, gram.consts_pose,
            gram.sd_cm, omega=gram.omega_pad, interpret=interpret,
            layout=gram.blend_layout,
        )

    T_cm = T4.reshape(3, E * J, batch)
    # The gram kernel streams Ksd in xb-row blocks (lbs_kernels._gram_xblock),
    # so it covers every SMPL-family J — the XLA gram_assembly_ref fallback
    # (which materialized a (B, 3J, 3J) X intermediate, ~30 ms of SMPL-X's
    # b4096 fit) is no longer dispatched from the lane-major path.
    R_cm = jnp.stack(
        [
            jnp.stack([glob_lm[a * 3 + c] for c in range(3)], axis=1).reshape(
                J * 3, batch
            )
            for a in range(3)
        ],
        axis=0,
    )  # (3, 3J, B), rows (j, c)
    if kernel_joints:
        P_cm = P4.reshape(3, E * J, batch)
        bJ_cm = tj_lm - p_j
    else:
        P_cm = jnp.zeros((3, 1, batch), dtype)
        bJ_cm = jnp.zeros((3, 1, batch), dtype)
    Gk, SAk, rbk, Sbk = lbs_kernels.gram_assembly(
        R_cm, T_cm, yk, P_cm, bJ_cm, gram.Ksd, gram.Lz_e, gram.sd1_2d,
        gram.q, gram.W1_col, has_joints=kernel_joints, interpret=interpret,
    )
    G = Gk.T.reshape(batch, E, E)
    SA = SAk.T.reshape(batch, 3, E)
    r = rk.T + rbk.T
    Sb = Sbk.T
    W = jnp.full(
        (batch,), w_base + (J if kernel_joints else 0), dtype
    )

    if weighted_joints:
        # Static-jw joints block, assembled in XLA (small (3, E, J, B)
        # contractions; the gram kernel only knows the unweighted form).
        jw64 = np.asarray(jw_static, np.float64).reshape(J)
        jw_j = jnp.asarray(jw64, dtype)
        bJ = tj_lm - p_j  # (3, J, B)
        P4w = P4 * jw_j[None, None, :, None]
        G = G + jnp.einsum('aejb,afjb->bef', P4w, P4, precision=_HI)
        r = r + jnp.einsum('aejb,ajb->be', P4w, bJ, precision=_HI)
        SA = SA + jnp.einsum('aejb,j->bae', P4, jw_j, precision=_HI)
        Sb = Sb + jnp.einsum('ajb,j->ba', bJ, jw_j, precision=_HI)
        W = W + float(jw64.sum())

    if scale_col:
        # Scale-column pieces from the kernel's target-side moments; the pos
        # side follows by linearity (pos = tgt − b), exactly as in
        # fit_shape_gram — here assembled lane-major from T4/P4.
        rt_full = rtk.T + jnp.einsum('aejb,ajb->be', T4, ytk, precision=_HI)
        r_b_vert = rk.T + jnp.einsum('aejb,ajb->be', T4, yk, precision=_HI)
        sum_t = jnp.sum(ytk, axis=1).T  # (B, 3)
        sum_b = jnp.sum(yk, axis=1).T
        s_tt, s_tp, s_pp = sck[0], sck[1], sck[2]  # (B,) each
        if scale_target:
            g_cross = -rt_full
            col_sq = s_tt
            col_b = -(s_tt - s_tp)
            SA_col = -sum_t
        else:
            g_cross = rt_full - r_b_vert
            col_sq = s_pp
            col_b = s_tp - s_pp
            SA_col = sum_t - sum_b
        if has_joints:
            jw_j = (
                jnp.asarray(np.asarray(jw_static, np.float64).reshape(J), dtype)
                if weighted_joints
                else jnp.ones((J,), dtype)
            )
            bJs = tj_lm - p_j  # (3, J, B)
            col_joint = -tj_lm if scale_target else p_j
            colw = col_joint * jw_j[None, :, None]
            g_cross = g_cross + jnp.einsum(
                'aejb,ajb->be', P4, colw, precision=_HI
            )
            col_sq = col_sq + jnp.einsum('ajb,ajb->b', col_joint, colw, precision=_HI)
            col_b = col_b + jnp.einsum('ajb,ajb->b', bJs, colw, precision=_HI)
            SA_col = SA_col + jnp.sum(colw, axis=1).T
        G = jnp.concatenate(
            [
                jnp.concatenate([G, g_cross[:, :, None]], axis=2),
                jnp.concatenate(
                    [g_cross[:, None, :], col_sq[:, None, None]], axis=2
                ),
            ],
            axis=1,
        )
        SA = jnp.concatenate([SA, SA_col[:, :, None]], axis=2)
        r = jnp.concatenate([r, col_b[:, None]], axis=1)

    return _solve_tail(
        bm, plan, gram, pre, G, SA, r, Sb, W,
        beta_regularizer, beta_regularizer2, kid_regularizer, share_beta,
        beta_regularizer_reference, kid_regularizer_reference,
        requested_keys, interpret,
        batch_mask=batch_mask,
        scale_target=scale_target, scale_fit=scale_fit,
        scale_regularizer=scale_regularizer,
        homog_vm=homog_vm,
    )


def _fk_ext_prelude(bm, plan, glob_lm, dtype) -> dict:
    """Shared lane-major FK-extended quantities of a shape solve for given
    global rotations glob_lm (9, J, B): relative rotations/pose features, the
    extended joint positions and their translation form. Keys: rel9 (9, J, B),
    rot_params_cols ((J-1)*9, B), p_j (3, J, B), P4 (3, E, J, B), t_lm
    (3, J, B), T4 (3, E, J, B), pj_cm (12, J, B), feat_cols (F, B)."""
    from .bodyfitter import fk_positions_ext_lm

    batch = glob_lm.shape[2]
    J = bm.num_joints
    parent_indices = np.array(bm.kintree_parents[1:])

    eye_col = jnp.broadcast_to(
        jnp.array([1, 0, 0, 0, 1, 0, 0, 0, 1], dtype)[:, None, None],
        (9, 1, batch),
    )
    parent9 = jnp.concatenate([eye_col, glob_lm[:, parent_indices]], axis=1)
    rel9 = rot_ops.matmul3x3_lm(parent9, glob_lm, transpose_a=True)
    # Pose feature rows (j-major, entry-minor), matching rel.reshape(B, (J-1)*9).
    rot_params_cols = jnp.transpose(rel9[:, 1:], (1, 0, 2)).reshape(
        (J - 1) * 9, batch
    )

    pos4 = fk_positions_ext_lm(bm, plan, glob_lm)  # (3, 1+E, J, B)
    p_j = pos4[:, 0]  # (3, J, B)
    P4 = pos4[:, 1:]  # (3, E, J, B)
    jte_lm = jnp.transpose(plan.J_template_ext[..., 0], (1, 0))[:, :, None]  # (3, J, 1)
    t_lm = jnp.stack(
        [
            p_j[a] - sum(glob_lm[a * 3 + c] * jte_lm[c] for c in range(3))
            for a in range(3)
        ],
        axis=0,
    )  # (3, J, B)
    JTE_lm = jnp.transpose(plan.J_template_ext[..., 1:], (1, 2, 0))[..., None]  # (3, E, J, 1)
    T4 = jnp.stack(
        [
            P4[a] - sum(glob_lm[a * 3 + c][None] * JTE_lm[c] for c in range(3))
            for a in range(3)
        ],
        axis=0,
    )  # (3, E, J, B)

    pj_cm = jnp.stack(
        [glob_lm[a * 3 + c] if c < 3 else t_lm[a] for a in range(3) for c in range(4)],
        axis=0,
    )  # (12, J, B)
    feat_cols = jnp.concatenate(
        [rot_params_cols, jnp.ones((1, batch), dtype)], axis=0
    )
    return dict(
        glob_lm=glob_lm, rel9=rel9, rot_params_cols=rot_params_cols,
        p_j=p_j, P4=P4, t_lm=t_lm, T4=T4, pj_cm=pj_cm, feat_cols=feat_cols,
    )


def _solve_tail(
    bm, plan, gram, pre, G, SA, r, Sb, W,
    beta_regularizer, beta_regularizer2, kid_regularizer, share_beta,
    beta_regularizer_reference, kid_regularizer_reference,
    requested_keys, interpret,
    trans_shift_jac=None,
    batch_mask=None,
    scale_target: bool = False,
    scale_fit: bool = False,
    scale_regularizer: float = 0.0,
    homog_vm=None,
) -> dict:
    """Regularize, solve the augmented [betas(,kid)(,scale), trans] system and
    build the lane-major result dict (shared by the moment-assembled and the
    runtime-weighted solves). With a scale column the caller passes E1 = E+1
    wide blocks (scale is the LAST column before trans): G (B, E1, E1),
    SA (B, 3, E1), r (B, E1), Sb (B, 3), W (B,); ``pre`` per
    :func:`_fk_ext_prelude`. ``trans_shift_jac`` (B, 3, E1) undoes a
    Jacobian-mean centering: t = t' − μᵀx."""
    glob_lm = pre['glob_lm']
    rel9, rot_params_cols = pre['rel9'], pre['rot_params_cols']
    p_j, P4, t_lm, T4 = pre['p_j'], pre['P4'], pre['t_lm'], pre['T4']
    batch = glob_lm.shape[2]
    E = gram.n_ext
    scale_col = scale_target or scale_fit
    E1 = E + (1 if scale_col else 0)
    n_betas = plan.n_betas
    dtype = G.dtype

    # --- regularizers (same semantics as fit_shape_gram) ---
    l2 = jnp.concatenate(
        [
            jnp.full((2,), beta_regularizer2, dtype),
            jnp.full((n_betas - 2,), beta_regularizer, dtype),
        ]
    )
    if beta_regularizer_reference is None:
        l2_ref = jnp.zeros((batch, n_betas), dtype)
    else:
        ref = jnp.asarray(beta_regularizer_reference).astype(dtype)
        if ref.shape[1] < n_betas:
            ref = jnp.pad(ref, ((0, 0), (0, n_betas - ref.shape[1])))
        l2_ref = ref[:, :n_betas]
    if plan.enable_kid:
        if kid_regularizer is None:
            kid_regularizer = beta_regularizer
        l2 = jnp.concatenate([l2, jnp.full((1,), kid_regularizer, dtype)])
        if kid_regularizer_reference is None:
            kid_ref = jnp.zeros((batch, 1), dtype)
        else:
            kid_ref = jnp.asarray(kid_regularizer_reference).reshape(batch, 1).astype(dtype)
        l2_ref = jnp.concatenate([l2_ref, kid_ref], axis=1)
    if scale_col:
        l2 = jnp.concatenate([l2, jnp.full((1,), scale_regularizer, dtype)])
        l2_ref = jnp.concatenate([l2_ref, jnp.zeros((batch, 1), dtype)], axis=1)
    l2_rhs = l2 * l2_ref
    if share_beta:
        # Reference identity-row semantics (np/lstsq.py:26-55 there): under
        # partial share the pull enters through l2-weighted identity rows
        # with rhs l2*ref, i.e. scaled by l2 once more than the non-shared
        # moment form.
        l2_rhs = l2 * l2_rhs

    eyeW = W[:, None, None] * jnp.eye(3, dtype=dtype)
    SAT = jnp.swapaxes(SA, -1, -2)
    row_b = jnp.concatenate([G, SAT], axis=2)
    row_t = jnp.concatenate([SA, eyeW], axis=2)
    G_aug = jnp.concatenate([row_b, row_t], axis=1)
    r_aug = jnp.concatenate([r + l2_rhs, Sb], axis=1)
    G_aug = G_aug + jnp.diag(jnp.concatenate([l2, jnp.zeros((3,), dtype)]))

    if share_beta:
        # Betas (+kid) shared; a scale column stays per-instance with trans.
        sol = _solve_partial_share(G_aug, r_aug, n_shared=E, batch_mask=batch_mask)
    else:
        sol = solve_spd_unrolled(G_aug, r_aug)

    new_shape = sol[:, :n_betas]
    new_kid_factor = sol[:, n_betas] if plan.enable_kid else None
    new_scale_corr = sol[:, E] + 1 if scale_col else None
    new_trans = sol[:, E1:]
    if trans_shift_jac is not None:
        new_trans = new_trans - jnp.einsum(
            'bae,be->ba', trans_shift_jac, sol[:, :E1], precision=_HI
        )
    if scale_fit:
        # Reference semantics (np/bodyfitter.py:845-850): scale_fit scales the
        # MODEL, so the published betas/kid are divided by the fitted scale.
        new_shape = new_shape / new_scale_corr[..., None]
        if new_kid_factor is not None:
            new_kid_factor = new_kid_factor / new_scale_corr

    result = dict(
        shape_betas=new_shape,
        kid_factor=new_kid_factor,
        trans=new_trans,
        trans_lm=new_trans.T,
        relative_orientations_lm=rel9,
        scale_corr=new_scale_corr,
        joints=None,
        vertices=None,
    )

    full_x = new_shape
    if plan.enable_kid:
        full_x = jnp.concatenate([full_x, new_kid_factor[:, None]], axis=1)
    x_T = full_x.T  # (E, B)

    if 'joints_lm' in requested_keys or 'joints' in requested_keys:
        joints_lm = (
            p_j
            + sum(P4[:, e] * x_T[e][None, None] for e in range(E))
            + new_trans.T[:, None, :]
        )
        if 'joints_lm' in requested_keys:
            result['joints_lm'] = joints_lm
        if 'joints' in requested_keys:
            result['joints'] = jnp.transpose(joints_lm, (2, 1, 0))

    recon_requested = (
        'vertices' in requested_keys
        or 'vertices_vm' in requested_keys
        or 'recon_spec' in requested_keys
    )
    if recon_requested:
        t2 = (
            t_lm
            + sum(T4[:, e] * x_T[e][None, None] for e in range(E))
            + new_trans.T[:, None, :]
        )
        pj2_cm = jnp.stack(
            [glob_lm[a * 3 + c] if c < 3 else t2[a] for a in range(3) for c in range(4)],
            axis=0,
        )
        f2_cols = jnp.concatenate(
            [rot_params_cols, jnp.ones((1, batch), dtype), x_T], axis=0
        )
        if 'recon_spec' in requested_keys:
            result['recon_spec'] = dict(
                pj_cm=pj2_cm, feat_cols=f2_cols,
                weights_pad=gram.weights_pad, consts_pad=gram.consts_full,
                interpret=interpret, layout=gram.blend_layout,
                # Homog-cache fields (None when the solve ran the scale or
                # streamed kernels): consumers run the cached recon kernel.
                homog_vm=homog_vm, x_cols=x_T, sd_cm=gram.sd_cm,
            )
        if 'vertices_vm' in requested_keys or 'vertices' in requested_keys:
            recon_vm = lbs_kernels.lbs_points(
                pj2_cm, f2_cols, gram.weights_pad, gram.consts_full,
                interpret=interpret, layout=gram.blend_layout,
            )
            if 'vertices_vm' in requested_keys:
                result['vertices_vm'] = recon_vm
            if 'vertices' in requested_keys:
                result['vertices'] = lbs_kernels.from_vertex_major(
                    recon_vm, bm.num_vertices, perm=gram.vperm
                )
    return result


def weighted_jac_mean_lm(bm, gram: GramData, glob_lm, T4, omega_vm):
    """ω-weighted mean of the per-vertex beta-Jacobian, (3, E, B), plus the
    weight sum (B,). Exact via ONE runtime-moment GEMM (``gram.Msd``ᵀ ω):

        Σ_v ω jac[a,e] = Σ_{j,c} R[a,c,j] (Σ_v ω w_vj SD_v[c,e]) + Σ_j T4 m_j.

    Used to CENTER the weighted normal equations: the Jacobian's per-joint
    translation columns carry a large common mode across vertices, and
    accumulating the uncentered f32 Gramian loses ~3 digits through the
    translation-elimination cancellation (the reference centers explicitly,
    np/bodyfitter.py:758-762 there; the unweighted moment path avoids it via
    f64 host moments)."""
    J = bm.num_joints
    E = gram.n_ext
    B = glob_lm.shape[2]
    V = omega_vm.shape[0]
    # ``omega_vm`` arrives in the chunk layout's vertex order; contract it
    # against the matching permuted statics (vertex sums are order-free).
    Msd = gram.Msd_vm if gram.Msd_vm is not None else gram.Msd
    Lm = jnp.einsum('vp,vb->pb', Msd, omega_vm, precision=_HI).reshape(
        J, 3, E, B
    )
    m_j = jnp.einsum('vj,vb->jb', gram.weights_pad[:V], omega_vm,
                     precision=_HI)
    w_tot = jnp.sum(omega_vm, axis=0)  # (B,)
    mu = jnp.stack(
        [
            sum(
                jnp.einsum('jeb,jb->eb', Lm[:, c], glob_lm[a * 3 + c],
                           precision=_HI)
                for c in range(3)
            )
            + jnp.einsum('ejb,jb->eb', T4[a], m_j, precision=_HI)
            for a in range(3)
        ],
        axis=0,
    )  # (3, E, B)
    return mu / jnp.maximum(w_tot, 1e-12), w_tot


def fit_shape_wgram_lm(
    bm,
    plan,
    gram: GramData,
    glob_lm: jax.Array,
    tgt_vm: jax.Array,
    tj_lm: Optional[jax.Array],
    omega_vm: jax.Array,
    jw_lm: Optional[jax.Array],
    beta_regularizer: float,
    beta_regularizer2: float,
    kid_regularizer: Optional[float],
    share_beta: bool,
    beta_regularizer_reference,
    kid_regularizer_reference,
    requested_keys=(),
    interpret: bool = False,
    batch_mask: Optional[jax.Array] = None,
    scale_target: bool = False,
    scale_fit: bool = False,
    scale_regularizer: float = 0.0,
) -> dict:
    """Lane-major shape solve under RUNTIME per-vertex weights ω (V, B).

    Runtime ω breaks the static joint-pair moments, so the normal equations
    are rebuilt per vertex chunk by :func:`~..ops.lbs_kernels.wgram_moments`
    (the Jacobian lives only in VMEM); the regularizer/solve/recon tail is
    shared with :func:`fit_shape_gram_lm`. Caller enforces the reference
    weight rule (joints ⇒ both ω and ``jw_lm`` given; no joints ⇒ ``jw_lm``
    is None): /root/reference/src/smplfitter/np/bodyfitter.py:758-766.
    ``gram`` must be the UNWEIGHTED gram (its per-vertex operands feed the
    kernel; ω arrives solely through ``omega_vm``).

    ``scale_target``/``scale_fit`` append the scale column IN-KERNEL (one
    extra Jacobian column per vertex, reference column semantics
    np/bodyfitter.py:751-757) — the weighted+scale configuration rides the
    same fused pass as every other weighted solve.
    """
    batch = glob_lm.shape[2]
    E = gram.n_ext
    scale_mode = 1 if scale_target else (2 if scale_fit else 0)
    E1 = E + (1 if scale_mode else 0)
    dtype = tgt_vm.dtype

    pre = _fk_ext_prelude(bm, plan, glob_lm, dtype)
    T4 = pre['T4']
    t4_cm = T4.reshape(3 * E, bm.num_joints, batch)  # rows (a, e) a-major
    # Center the Jacobian by its exact ω-weighted mean (the equivalent change
    # of variables t' = t + μᵀx): the translation columns' common mode would
    # otherwise cancel catastrophically in f32 during trans elimination.
    mu, w_tot = weighted_jac_mean_lm(bm, gram, glob_lm, T4, omega_vm)  # (3, E, B)
    if scale_mode:
        # Scale-column centering: ∓ the ω-weighted TARGET mean. For the pos
        # column (scale_fit) this is approximate (pos ≈ tgt) — any per-batch
        # constant is exact here (it folds into the translation change of
        # variables, undone below); the mean only needs to kill the common
        # mode for f32 conditioning.
        t_mean = jnp.einsum('avb,vb->ab', tgt_vm[:, : omega_vm.shape[0]],
                            omega_vm, precision=_HI) / jnp.maximum(
            jnp.sum(omega_vm, axis=0), 1e-12
        )
        mu_s = -t_mean if scale_target else t_mean  # (3, B)
        mu_full = jnp.concatenate([mu, mu_s[:, None, :]], axis=1)  # (3, E1, B)
    else:
        mu_s = None
        mu_full = mu
    # Posed template once per solve (posed_template_lm): consumed by the
    # wgram kernel AND by this iteration's cached recon kernel — the wgram
    # kernel otherwise re-streamed the (4, vc_w, F) constants per batch tile
    # and rebuilt the K=F homog dots at vc_w granularity.
    homog_vm = lbs_kernels.posed_template_lm(pre['feat_cols'], gram.consts_pose,
                                             interpret)
    Gk, SAk, rk, Sbk, Wk = lbs_kernels.wgram_moments(
        tgt_vm, pre['pj_cm'], homog_vm, t4_cm,
        gram.weights_pad, gram.sd_cm,
        mu.reshape(3 * E, batch), omega_vm,
        mu_s=mu_s, scale_mode=scale_mode,
        interpret=interpret, layout=gram.blend_layout_w,
    )
    G = Gk.T.reshape(batch, E1, E1)
    SA = SAk.T.reshape(batch, 3, E1)
    r = rk.T
    Sb = Sbk.T
    W = Wk[0]

    if tj_lm is not None:
        # Runtime-jw joints block (small (3, E1, J, B) contractions), in the
        # same centered variables (P4 − μ; scale column −tj/p_j − μ_s).
        p_j, P4 = pre['p_j'], pre['P4']
        bJ = tj_lm - p_j  # (3, J, B)
        P4c = P4 - mu[:, :, None, :]
        if scale_mode:
            col_j = (-tj_lm if scale_target else p_j) - mu_s[:, None, :]
            P4c = jnp.concatenate([P4c, col_j[:, None]], axis=1)  # (3, E1, J, B)
        P4w = P4c * jw_lm[None, None]
        G = G + jnp.einsum('aejb,afjb->bef', P4w, P4c, precision=_HI)
        r = r + jnp.einsum('aejb,ajb->be', P4w, bJ, precision=_HI)
        SA = SA + jnp.einsum('aejb,jb->bae', P4c, jw_lm, precision=_HI)
        Sb = Sb + jnp.einsum('ajb,jb->ba', bJ, jw_lm, precision=_HI)
        W = W + jnp.sum(jw_lm, axis=0)

    return _solve_tail(
        bm, plan, gram, pre, G, SA, r, Sb, W,
        beta_regularizer, beta_regularizer2, kid_regularizer, share_beta,
        beta_regularizer_reference, kid_regularizer_reference,
        requested_keys, interpret,
        trans_shift_jac=jnp.transpose(mu_full, (2, 0, 1)),  # (B, 3, E1)
        batch_mask=batch_mask,
        scale_target=scale_target, scale_fit=scale_fit,
        scale_regularizer=scale_regularizer,
        homog_vm=homog_vm,
    )


def lbs_recon_spec_lm(
    bm,
    plan,
    gram: GramData,
    glob_lm: jax.Array,
    x_T: jax.Array,
    interpret: bool = False,
):
    """Deferred extended-LBS reconstruction operands for a KNOWN shape.

    The solve path (:func:`fit_shape_gram_lm`) emits a ``recon_spec`` whose
    shape columns come out of the linear solve; this builds the same spec for
    GIVEN shape columns ``x_T`` (E, B) — betas (+ kid when the plan has it) —
    so known-shape fitting (reference semantics
    /root/reference/src/smplfitter/np/bodyfitter.py:509-607) can ride the same
    fused recon+part-sums kernels with no per-instance mesh materialization.

    Returns ``(spec, joints_lm, rec_sum)``: the kernel spec dict, the model
    joints (3, J, B) of the reconstruction, and the gram-weighted vertex sum
    Σ_v ω_v rec_v (3, B), contracted from the precomputed first moments
    ``gram.Kc``/``gram.W1`` — no (3, V, B) pass. All quantities are in the
    centered target frame (no translation folded in).
    """
    batch = glob_lm.shape[2]
    dtype = glob_lm.dtype
    E = gram.n_ext

    pre = _fk_ext_prelude(bm, plan, glob_lm, dtype)
    p_j = pre['p_j'] + jnp.einsum('aejb,eb->ajb', pre['P4'], x_T, precision=_HI)
    t2 = pre['t_lm'] + sum(
        pre['T4'][:, e] * x_T[e][None, None] for e in range(E)
    )  # (3, J, B)

    pj_cm = jnp.stack(
        [glob_lm[a * 3 + c] if c < 3 else t2[a] for a in range(3) for c in range(4)],
        axis=0,
    )
    feat_cols = jnp.concatenate([pre['feat_cols'], x_T], axis=0)
    spec = dict(
        pj_cm=pj_cm, feat_cols=feat_cols,
        weights_pad=gram.weights_pad, consts_pad=gram.consts_full,
        interpret=interpret, layout=gram.blend_layout,
    )

    # Σ_v ω_v rec_v[a] = Σ_j R_j[a,:]·(Kc_j @ feat) + W1_j t2[a,j]
    kq = jnp.einsum('jcf,fb->cjb', gram.Kc, feat_cols, precision=_HI)
    rec_sum = jnp.stack(
        [
            sum(
                jnp.einsum('jb,jb->b', glob_lm[a * 3 + c], kq[c], precision=_HI)
                for c in range(3)
            )
            + jnp.einsum('j,jb->b', gram.W1, t2[a], precision=_HI)
            for a in range(3)
        ],
        axis=0,
    )  # (3, B)
    return spec, p_j, rec_sum
