"""Mirroring with gradient refinement.

Closed-form flip (BodyFlipper) followed by Adam refinement of the flipped
parameters against the mirrored mesh — the analogue of the reference's
BodyFlipperOpt (/root/reference/src/smplfitter/pt/bodyflipper_opt.py:36-181),
built on the same scan-based refiner as BodyFitterOpt.
"""

from __future__ import annotations

import jax.numpy as jnp

from .bodyfitter_opt import BodyFitterOpt
from .bodyflipper import BodyFlipper
from .bodymodel import BodyModel


class BodyFlipperOpt:
    """Horizontally flips body parameters, with optional Adam refinement."""

    def __init__(self, body_model: BodyModel):
        self.body_model = body_model
        self.flipper = BodyFlipper(body_model)
        self.fitter_opt = BodyFitterOpt(body_model)

    def flip(
        self,
        pose_rotvecs,
        shape_betas,
        trans,
        kid_factor=None,
        num_iter: int = 1,
        refine_steps: int = 0,
        refine_lr: float = 0.03,
    ) -> dict:
        """Flipped parameters; ``refine_steps > 0`` adds Adam refinement against
        the mirrored target mesh."""
        if refine_steps == 0:
            return self.flipper.flip(
                pose_rotvecs, shape_betas, trans, kid_factor, num_iter
            )

        inp = self.body_model(
            pose_rotvecs=pose_rotvecs, shape_betas=shape_betas, trans=trans,
            kid_factor=kid_factor,
        )
        flipped_vertices = self.flipper.flip_vertices(inp['vertices'])
        init = self.flipper.flip(pose_rotvecs, shape_betas, trans, kid_factor, num_iter)

        refined = self.fitter_opt._refine(
            jnp.asarray(flipped_vertices),
            None,
            None,
            None,
            init['pose_rotvecs'],
            init['shape_betas'],
            init['trans'],
            init.get('kid_factor'),
            beta_regularizer=1e-2,
            num_steps=refine_steps,
            lr=refine_lr,
            warmup_ratio=0.5,
        )
        return refined
