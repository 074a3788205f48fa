"""Grafting SMPL+H hand poses onto SMPL-topology fits.

Fits the smplh16 model to the input vertices with hand vertices down-weighted,
overwrites the hand pose parameters from a source pose (mirroring right->left),
re-poses, and blends the new hands in with a smootherstep mask over |x|.
Semantics per /root/reference/src/smplfitter/pt/handreplacer.py:11-79.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.modeldata import load_pickle, load_vertex_converter_csr
from .bodyfitter import BodyFitter
from .bodymodel import BodyModel


def smootherstep(x, x0, x1):
    y = jnp.clip((x - x0) / (x1 - x0), 0.0, 1.0)
    return y**3 * (y * (y * 6.0 - 15.0) + 10.0)


class HandReplacer:
    """Replaces the hand regions of SMPL-topology meshes with posed SMPL+H hands."""

    def __init__(self, hand_pose_source, smplh_model: BodyModel | None = None):
        data_root = os.getenv('DATA_ROOT', '.')
        hand_indices = load_pickle(
            f'{data_root}/body_models/smplx/MANO_SMPLX_vertex_ids.pkl'
        )
        smplx_hand_indices = list(hand_indices['left_hand']) + list(
            hand_indices['right_hand']
        )
        smplx2smpl = load_vertex_converter_csr(
            f'{data_root}/body_models/smplx2smpl_deftrafo_setup.pkl'
        )
        smpl_hand_indices = np.unique(
            (smplx2smpl[:, smplx_hand_indices] > 0.5).nonzero()[0]
        )

        self.smplh_bm = smplh_model or BodyModel('smplh16', 'neutral')
        self.hand_indices_all = np.asarray(smpl_hand_indices, dtype=np.int64)

        vertex_weights = np.ones(self.smplh_bm.num_vertices, np.float32)
        vertex_weights[self.hand_indices_all] = 1e-1
        self.vertex_weights = jnp.asarray(vertex_weights)
        # The hand down-weighting is fixed per replacer, so it is baked into
        # the fitter's precomputed moments: the fit keeps the fused-kernel
        # fast path (per-call per-vertex weights would force the ~14x slower
        # streamed general solve).
        self.smplh_fitter = BodyFitter(self.smplh_bm, vertex_weights=vertex_weights)

        # Blend mask from the T-pose template (host-side).
        template = np.asarray(self.smplh_fitter.plan.default_mesh)
        if len(smpl_hand_indices) > 0:
            hand_min_x = float(np.min(np.abs(template[smpl_hand_indices])[:, 0]))
        else:
            hand_min_x = float(np.percentile(np.abs(template[:, 0]), 95))
        self.hand_mix_weight = smootherstep(
            jnp.abs(jnp.asarray(template[:, 0])), hand_min_x - 0.1, hand_min_x
        )

        self.hand_pose_source = jnp.asarray(hand_pose_source).reshape(-1)

    def mirror_rotvecs(self, hand_pose: jax.Array) -> jax.Array:
        hflip = jnp.array([1.0, -1.0, -1.0], hand_pose.dtype)
        return (hand_pose.reshape(-1, 3) * hflip).reshape(-1)

    def copy_hand_params(self, smplh_pose: jax.Array) -> jax.Array:
        """Overwrite the 2x15 hand-joint rotvecs from the source pose
        (right hand as-is; left hand mirrored from the right)."""
        start = 22
        left_sl = slice(start * 3, (start + 15) * 3)
        right_sl = slice((start + 15) * 3, (start + 30) * 3)
        right = self.hand_pose_source[right_sl]
        smplh_pose = smplh_pose.at[:, left_sl].set(self.mirror_rotvecs(right))
        smplh_pose = smplh_pose.at[:, right_sl].set(right)
        return smplh_pose

    def replace_hand(self, smpl_verts) -> jax.Array:
        """Return ``smpl_verts`` with the hand regions replaced by the posed hands."""
        smpl_verts = jnp.asarray(smpl_verts)
        fit = self.smplh_fitter.fit(
            target_vertices=smpl_verts,
            num_iter=3,
            beta_regularizer=0.0,
            final_adjust_rots=False,
            requested_keys=['pose_rotvecs', 'shape_betas'],
        )
        new_pose = self.copy_hand_params(fit['pose_rotvecs'])
        new_res = self.smplh_bm(
            pose_rotvecs=new_pose, shape_betas=fit['shape_betas'], trans=fit['trans']
        )
        new_verts = new_res['vertices']
        return smpl_verts + (new_verts - smpl_verts) * self.hand_mix_weight[:, None]
