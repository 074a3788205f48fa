"""Gradient refinement of closed-form fits (Adam over global 6D rotations).

Initializes with the closed-form :class:`BodyFitter`, then refines pose, shape
and translation by Adam on the vertex/joint alignment loss. Optimization runs
in GLOBAL rotation space (6D representation): gradients on distal joints don't
need to propagate through the kinematic chain
(cf. /root/reference/src/smplfitter/pt/bodyfitter_opt.py:146-150).

TPU-first: the whole refinement is one ``lax.scan`` over optimizer steps inside
a single jitted graph (optax Adam + warmup-cosine schedule) — no Python-loop
step dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import rotation as rot_ops
from ..ops.precision import matmul_precision
from .bodyfitter import BodyFitter
from .bodymodel import BodyModel, fk_rotations, forward


class BodyFitterOpt:
    """Closed-form fit + optional Adam refinement."""

    def __init__(self, body_model: BodyModel, enable_kid: bool = False):
        self.body_model = body_model
        self.fitter = BodyFitter(body_model, enable_kid=enable_kid)
        self.enable_kid = enable_kid

    def fit(
        self,
        target_vertices,
        target_joints=None,
        vertex_weights=None,
        joint_weights=None,
        num_iter: int = 1,
        beta_regularizer: float = 1.0,
        beta_regularizer2: float = 0.0,
        share_beta: bool = False,
        final_adjust_rots: bool = True,
        scale_target: bool = False,
        scale_fit: bool = False,
        refine_steps: int = 0,
        refine_lr: float = 0.03,
        warmup_ratio: float = 0.5,
    ) -> dict:
        """Closed-form fit, then ``refine_steps`` Adam steps (0 = no refinement)."""
        init = self.fitter.fit(
            target_vertices,
            target_joints=target_joints,
            vertex_weights=vertex_weights,
            joint_weights=joint_weights,
            num_iter=num_iter,
            beta_regularizer=beta_regularizer,
            beta_regularizer2=beta_regularizer2,
            share_beta=share_beta,
            final_adjust_rots=final_adjust_rots if refine_steps == 0 else False,
            scale_target=scale_target,
            scale_fit=scale_fit,
            requested_keys=['pose_rotvecs', 'shape_betas', 'trans'],
        )
        if refine_steps == 0:
            return init

        with matmul_precision():
            return self._refine(
                jnp.asarray(target_vertices),
                None if target_joints is None else jnp.asarray(target_joints),
                vertex_weights,
                joint_weights,
                init['pose_rotvecs'],
                init['shape_betas'],
                init['trans'],
                init.get('kid_factor'),
                beta_regularizer,
                refine_steps,
                refine_lr,
                warmup_ratio,
            )

    def _refine(
        self,
        target_vertices,
        target_joints,
        vertex_weights,
        joint_weights,
        init_pose,
        init_betas,
        init_trans,
        init_kid_factor,
        beta_regularizer,
        num_steps,
        lr,
        warmup_ratio,
    ) -> dict:
        bm = self.body_model.data
        num_joints = bm.num_joints

        init_rel = rot_ops.rotvec2mat(init_pose.reshape(-1, num_joints, 3))
        init_glob = fk_rotations(bm, init_rel)

        params = dict(
            rot6d=rot_ops.rotmat_to_rot6d(init_glob),
            betas=init_betas,
            trans=init_trans,
        )
        if init_kid_factor is not None:
            params['kid'] = init_kid_factor

        warmup_steps = max(1, int(num_steps * warmup_ratio))
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, warmup_steps),
                optax.cosine_decay_schedule(lr, max(1, num_steps - warmup_steps)),
            ],
            [warmup_steps],
        )
        optimizer = optax.adam(learning_rate=schedule, b1=0.97, b2=0.999)

        def loss_fn(p):
            glob_rotmats = rot_ops.rot6d_to_rotmat(p['rot6d'])
            res = forward(
                bm,
                glob_rotmats=glob_rotmats,
                shape_betas=p['betas'],
                trans=p['trans'],
                kid_factor=p.get('kid'),
            )
            v_diff_norm = jnp.linalg.norm(res['vertices'] - target_vertices, axis=-1)
            if vertex_weights is not None:
                loss = jnp.mean(vertex_weights * v_diff_norm)
            else:
                loss = jnp.mean(v_diff_norm)
            if target_joints is not None:
                j_diff_norm = jnp.linalg.norm(res['joints'] - target_joints, axis=-1)
                if joint_weights is not None:
                    loss = loss + jnp.mean(joint_weights * j_diff_norm)
                else:
                    loss = loss + jnp.mean(j_diff_norm)
            if beta_regularizer > 0 and p['betas'].shape[1] > 2:
                loss = loss + beta_regularizer * jnp.mean(p['betas'][:, 2:] ** 2)
            return loss

        opt_state = optimizer.init(params)

        def step(carry, _):
            p, s = carry
            grads = jax.grad(loss_fn)(p)
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), None

        (params, _), _ = jax.lax.scan(step, (params, opt_state), None, length=num_steps)

        glob_final = rot_ops.rot6d_to_rotmat(params['rot6d'])
        parent_indices = np.array(bm.kintree_parents[1:])
        batch = glob_final.shape[0]
        parent_glob = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.eye(3, dtype=glob_final.dtype), (batch, 1, 3, 3)),
                glob_final[:, parent_indices],
            ],
            axis=1,
        )
        rel = rot_ops.matmul3x3(parent_glob, glob_final, transpose_a=True)
        pose_rotvecs = rot_ops.mat2rotvec(rel).reshape(batch, num_joints * 3)

        result = dict(
            pose_rotvecs=pose_rotvecs,
            shape_betas=params['betas'],
            trans=params['trans'],
        )
        if 'kid' in params:
            result['kid_factor'] = params['kid']
        return result
