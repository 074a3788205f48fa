"""Parameter conversion between SMPL-family body models.

Converts (pose, betas, trans) of one model family to another by transferring
vertices through a fixed barycentric correspondence and refitting.

TPU-first: the sparse transfer matrix (<= ~3 nonzeros per row) is converted at
init to fixed-width gather form (indices + weights), so the conversion is a
dense gather + weighted sum that lives entirely inside jit — unlike the
reference JAX backend's host scipy round-trip, which broke device residency
(/root/reference/src/smplfitter/jax/bodyconverter.py:139-145). Semantics per
/root/reference/src/smplfitter/pt/bodyconverter.py:48-149.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.modeldata import csr_to_dense_gather, load_vertex_converter_csr
from . import bodyfitter as _bodyfitter
from .bodymodel import BodyModel


def _deftrafo_path(num_verts_in: int, num_verts_out: int) -> Optional[str]:
    """Resolve the deformation-transfer setup file for a model pair, or None if
    the topologies match (no conversion needed)."""
    if num_verts_in == num_verts_out:
        return None
    data_root = os.getenv('DATA_ROOT', '.')
    if num_verts_in < num_verts_out:
        return f'{data_root}/body_models/smpl2smplx_deftrafo_setup.pkl'
    return f'{data_root}/body_models/smplx2smpl_deftrafo_setup.pkl'


class VertexConverter:
    """Fixed-width gather form of a sparse vertex-transfer matrix."""

    def __init__(self, csr):
        indices, weights = csr_to_dense_gather(csr)
        self.indices = jnp.asarray(indices)  # (V_out, k)
        self.weights = jnp.asarray(weights)  # (V_out, k)

    def __call__(self, vertices: jax.Array) -> jax.Array:
        """(B, V_in, 3) -> (B, V_out, 3), fully jit-able."""
        gathered = vertices[:, self.indices]  # (B, V_out, k, 3)
        return jnp.einsum('bvkc,vk->bvc', gathered, self.weights)


class BodyConverter:
    """Converts between body model parametrizations (e.g. SMPL <-> SMPL-X)."""

    def __init__(self, body_model_in: BodyModel, body_model_out: BodyModel):
        self.body_model_in = body_model_in
        self.body_model_out = body_model_out
        # Kid is always enabled on the fitter and suppressed by regularization
        # (1e9) when unused — keeps the shape solve monomorphic
        # (cf. /root/reference/src/smplfitter/pt/bodyconverter.py:30, 107).
        self.fitter = _bodyfitter.BodyFitter(body_model_out, enable_kid=True)

        csr_path = _deftrafo_path(body_model_in.num_vertices, body_model_out.num_vertices)
        if csr_path is not None:
            self.vertex_converter: Optional[VertexConverter] = VertexConverter(
                load_vertex_converter_csr(csr_path)
            )
        else:
            self.vertex_converter = None

    def convert(
        self,
        pose_rotvecs,
        shape_betas,
        trans,
        kid_factor=None,
        known_output_pose_rotvecs=None,
        known_output_shape_betas=None,
        known_output_kid_factor=None,
        num_iter: int = 1,
    ) -> dict:
        """Convert input parameters to the output model's parametrization.

        Returns pose_rotvecs/shape_betas/trans (and kid_factor if given).
        """
        inp = self.body_model_in(
            pose_rotvecs=pose_rotvecs, shape_betas=shape_betas, trans=trans,
            kid_factor=kid_factor,
        )
        verts = self.convert_vertices(inp['vertices'])

        if known_output_shape_betas is not None:
            fit = self.fitter.fit_with_known_shape(
                shape_betas=known_output_shape_betas,
                kid_factor=known_output_kid_factor,
                target_vertices=verts,
                num_iter=num_iter,
                final_adjust_rots=False,
                requested_keys=['pose_rotvecs'],
            )
            out = dict(pose_rotvecs=fit['pose_rotvecs'], trans=fit['trans'])
        elif known_output_pose_rotvecs is not None:
            fit = self.fitter.fit_with_known_pose(
                pose_rotvecs=known_output_pose_rotvecs,
                target_vertices=verts,
                beta_regularizer=0.0,
                kid_regularizer=1e9 if kid_factor is None else 0.0,
            )
            out = dict(shape_betas=fit['shape_betas'], trans=fit['trans'])
            if kid_factor is not None:
                out['kid_factor'] = fit['kid_factor']
        else:
            fit = self.fitter.fit(
                target_vertices=verts,
                num_iter=num_iter,
                beta_regularizer=0.0,
                final_adjust_rots=False,
                kid_regularizer=1e9 if kid_factor is None else 0.0,
                requested_keys=['pose_rotvecs', 'shape_betas'],
            )
            out = dict(
                pose_rotvecs=fit['pose_rotvecs'],
                shape_betas=fit['shape_betas'],
                trans=fit['trans'],
            )
            if kid_factor is not None:
                out['kid_factor'] = fit['kid_factor']
        return out

    def convert_vertices(self, inp_vertices) -> jax.Array:
        """Transfer vertices to the output topology (identity if topologies match)."""
        inp_vertices = jnp.asarray(inp_vertices)
        if self.vertex_converter is None:
            return inp_vertices
        return self.vertex_converter(inp_vertices)
