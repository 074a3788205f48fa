"""Multi-chip batch sharding for fitting workloads.

The fitting workload is embarrassingly parallel per instance; the ONLY
cross-instance communication in the entire system (cf. SURVEY.md §2.7) is:

 1. the summed-Gramian / summed-rhs reduction of ``share_beta`` solves
    (ops/lstsq.py ``shared=True``), and
 2. the batch-wide reduction hidden in nothing else — everything else is
    per-instance math.

So the whole "distributed backend" is: lay the batch axis over a
``jax.sharding.Mesh`` data axis with ``NamedSharding``; XLA partitions every
per-instance op locally and emits an all-reduce over ICI exactly at the
``jnp.sum(axis=0)`` in the shared solve. Scaling to a pod = bigger mesh, same
program. These helpers make that one-liner ergonomic.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over all (or the given) devices for batch-data parallelism."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put every array in the pytree with its batch dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, 'ndim') and x.ndim > 0 else x,
        tree,
    )


def make_sharded_fit_fn(
    fitter,
    mesh: Optional[Mesh] = None,
    donate: bool = False,
    **fit_kwargs,
):
    """Build a jitted fit function whose batch inputs are sharded over ``mesh``.

    Inputs may live on host or any device; they are constrained to the batch
    sharding, so per-instance compute runs fully locally per chip and only the
    share_beta reductions (if enabled) cross chips.

    ``fit_kwargs`` are the static fit flags (num_iter, regularizers, etc.).
    """
    if mesh is None:
        mesh = make_mesh()
    sharding = batch_sharding(mesh)

    def _constrain(x):
        return None if x is None else jax.lax.with_sharding_constraint(x, sharding)

    def fit(verts, joints=None, vertex_weights=None, joint_weights=None):
        return fitter.fit(
            _constrain(verts),
            target_joints=_constrain(joints),
            vertex_weights=_constrain(vertex_weights),
            joint_weights=_constrain(joint_weights),
            **fit_kwargs,
        )

    return jax.jit(fit, donate_argnums=(0,) if donate else ())
