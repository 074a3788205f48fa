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

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import lstsq as _lstsq

DATA_AXIS = 'data'


def padded_global_batch(batch: int, n_devices: int) -> int:
    """Smallest global batch >= ``batch`` that splits evenly over
    ``n_devices`` with every per-device shard kernel-eligible (multiple of 8
    up to the whole-block regime, multiple of 128 beyond — the same contract
    single-chip ``fit`` pads to, bodyfitter.kernel_batch_pad)."""
    from ..ops import lbs_kernels

    per = -(-batch // n_devices)
    per += lbs_kernels.kernel_batch_pad(per)
    return per * n_devices


@contextlib.contextmanager
def cross_shard(axis_name: str = DATA_AXIS):
    """Mark the enclosed fit as running INSIDE a ``shard_map`` region: the
    share_beta shared-block reductions complete with an explicit ``psum``
    over ``axis_name`` (under plain GSPMD jit this is unnecessary — XLA
    derives the all-reduce from the batch-sharded ``jnp.sum`` itself).
    Scoped via a ContextVar: only the trace that opened the region sees it."""
    token = _lstsq.CROSS_SHARD_AXIS.set(axis_name)
    try:
        yield
    finally:
        _lstsq.CROSS_SHARD_AXIS.reset(token)


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
    method: str = 'shard_map',
    pad_to_mesh: bool = True,
    **fit_kwargs,
):
    """Build a jitted fit function whose batch inputs are sharded over ``mesh``.

    Inputs may live on host or any device; they are constrained to the batch
    sharding, so per-instance compute runs fully locally per chip and only the
    share_beta reductions (if enabled) cross chips.

    ``pad_to_mesh`` (default on) gives the sharded boundary the same batch
    ergonomics as single-chip ``fit``: ANY global batch is accepted — it is
    padded to :func:`padded_global_batch` by last-instance replication, a
    zero ``batch_mask`` keeps ``share_beta``'s summed Gramian exact over the
    padded lanes (the same contract as bodyfitter's own kernel padding), and
    every output is sliced back to the real batch. The returned function also
    accepts an optional per-call ``batch_mask`` keyword (padded with zeros
    alongside the inputs).

    ``method``:
      - ``'shard_map'`` (default): the fit body is mapped per device with
        ``jax.shard_map``; each device traces the fit on its LOCAL batch, so
        the fused Pallas kernels run shard-locally by construction (GSPMD has
        no partitioning rule for ``pallas_call`` and would gather/replicate
        them), and the share_beta shared-block sums complete with an explicit
        ``psum`` over the mesh axis (see :func:`cross_shard`). With
        ``pad_to_mesh`` every per-device shard is kernel-eligible by
        construction; without it the per-device batch must be divisible by 8
        for the kernel path to engage.
      - ``'gspmd'``: plain jit + sharding constraints; XLA partitions the
        per-instance ops and derives the all-reduce itself. Correct for the
        pure-XLA formulation (``use_kernels=False`` or CPU).

    ``fit_kwargs`` are the static fit flags (num_iter, regularizers, etc.).
    """
    import jax.numpy as jnp

    from ..models.bodyfitter import _pad_batch, _pad_mask, _slice_batch

    if mesh is None:
        mesh = make_mesh()
    axis_name = mesh.axis_names[0]
    n_devices = int(np.prod(mesh.devices.shape))
    sharding = NamedSharding(mesh, P(axis_name))

    def _pad_inputs(verts, joints, vertex_weights, joint_weights, batch_mask):
        """Pad the global batch so every shard is kernel-eligible; returns the
        (possibly padded) inputs plus (real_batch, padded_batch)."""
        B = verts.shape[0]
        padded = padded_global_batch(B, n_devices) if pad_to_mesh else B
        pad = padded - B
        if pad == 0:
            return (verts, joints, vertex_weights, joint_weights,
                    batch_mask), B, B
        verts, joints, vertex_weights, joint_weights = _pad_batch(
            pad, B, verts, joints, vertex_weights, joint_weights
        )
        # A mask is only needed when instances couple (share_beta) or the
        # caller already supplied one; per-instance solves ignore padding.
        if fit_kwargs.get('share_beta', False) or batch_mask is not None:
            batch_mask = (
                _pad_mask(B, pad, verts.dtype)
                if batch_mask is None
                else jnp.concatenate(
                    [jnp.asarray(batch_mask),
                     jnp.zeros((pad,), jnp.asarray(batch_mask).dtype)]
                )
            )
        return (verts, joints, vertex_weights, joint_weights,
                batch_mask), B, padded

    if method == 'gspmd':
        def _constrain(x):
            return None if x is None else jax.lax.with_sharding_constraint(x, sharding)

        def fit(verts, joints=None, vertex_weights=None, joint_weights=None,
                batch_mask=None):
            (verts, joints, vertex_weights, joint_weights,
             batch_mask), B, padded = _pad_inputs(
                verts, joints, vertex_weights, joint_weights, batch_mask)
            out = fitter.fit(
                _constrain(verts),
                target_joints=_constrain(joints),
                vertex_weights=_constrain(vertex_weights),
                joint_weights=_constrain(joint_weights),
                batch_mask=_constrain(batch_mask),
                **fit_kwargs,
            )
            return _slice_batch(out, B, padded) if padded != B else out

        return jax.jit(fit, donate_argnums=(0,) if donate else ())
    if method != 'shard_map':
        raise ValueError(f'unknown sharding method {method!r}')

    def fit(verts, joints=None, vertex_weights=None, joint_weights=None,
            batch_mask=None):
        (verts, joints, vertex_weights, joint_weights,
         batch_mask), B, padded = _pad_inputs(
            verts, joints, vertex_weights, joint_weights, batch_mask)
        optional = (joints, vertex_weights, joint_weights, batch_mask)
        mask = tuple(x is not None for x in optional)
        present = (verts,) + tuple(x for x in optional if x is not None)

        def inner(*args):
            it = iter(args[1:])
            full = [next(it) if m else None for m in mask]
            with cross_shard(axis_name):
                return fitter.fit(
                    args[0],
                    target_joints=full[0],
                    vertex_weights=full[1],
                    joint_weights=full[2],
                    batch_mask=full[3],
                    **fit_kwargs,
                )

        mapped = jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(axis_name),) * len(present),
            out_specs=P(axis_name),
            # The Pallas out_shapes carry no varying-mesh-axes metadata; the
            # per-shard program is identical on every device by construction.
            check_vma=False,
        )
        out = mapped(*present)
        return _slice_batch(out, B, padded) if padded != B else out

    return jax.jit(fit, donate_argnums=(0,) if donate else ())
