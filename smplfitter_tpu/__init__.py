"""smplfitter_tpu: TPU-native SMPL-family body model fitting.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the SMPLFitter
reference library: body model forward passes, closed-form inverse fitting
(pose, shape, translation, scale, kid factor), parameter conversion between
model families, mirroring, hand replacement and gradient refinement — designed
for TPU hardware (MXU-shaped GEMMs, level-batched kinematics, branch-free
rotation numerics, batch sharding over device meshes).
"""

from __future__ import annotations

__version__ = '0.1.0'

from .models.bodymodel import BodyModel
from .models.bodyfitter import BodyFitter
from .models.bodyconverter import BodyConverter
from .models.bodyflipper import BodyFlipper
from .models.bodyfitter_opt import BodyFitterOpt
from .models.bodyflipper_opt import BodyFlipperOpt
from .models.handreplacer import HandReplacer
from .api import (
    get_cached_body_model,
    get_cached_fit_fn,
    get_fit_grad_fn,
    hoist_constants,
)
from .ops.precision import set_matmul_precision, get_matmul_precision

__all__ = [
    'BodyModel',
    'BodyFitter',
    'BodyConverter',
    'BodyFlipper',
    'BodyFitterOpt',
    'BodyFlipperOpt',
    'HandReplacer',
    'get_cached_body_model',
    'get_cached_fit_fn',
    'get_fit_grad_fn',
    'hoist_constants',
    'set_matmul_precision',
    'get_matmul_precision',
    '__version__',
]
