"""Cached construction and jit-compiled fit closures.

The TPU analogue of the reference deployment wrappers
(/root/reference/src/smplfitter/pt/__init__.py:36-132): hashable config tuples
key an lru_cache of jitted fit functions, so repeated calls with the same
config reuse both the model arrays and the compiled XLA executable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .models.bodymodel import BodyModel
from .models.bodyfitter import BodyFitter


def hoist_constants(fn, *example_args):
    """Trace ``fn`` once and return ``(wrapped, consts)`` with the closed-over
    arrays turned into explicit arguments: ``wrapped(consts, *args)`` computes
    ``fn(*args)`` for any ``args`` shaped like ``example_args``.

    A fit closure closes over ~50 MB of model data (shape/pose blendshape
    matrices, moment tensors). Under plain ``jax.jit`` those ride into the
    program as inlined MLIR constants, which an AOT compiler must parse,
    dedupe, fold and (for gradients) transpose — grad-of-fit programs blow
    past compile memory budgets on exactly this (measured: 99 MB of MLIR for
    grad-of-fit at batch 32, vs 4 MB with the constants hoisted). Hoisting
    makes them compile-time *parameters*: pass ``consts`` through ``jit`` as a
    regular pytree argument.

        loss_h, consts = hoist_constants(loss, tv, tj)
        vg = jax.jit(jax.value_and_grad(loss_h, argnums=(1, 2)))
        value, grads = vg(consts, tv, tj)

    The trace is shape-specialized: ``wrapped`` only accepts arguments with
    the same shapes/dtypes as ``example_args`` (one hoist per batch size, like
    one jit cache entry per shape). ``fn`` must be trace-transparent (the fit
    entry points are); differentiating ``wrapped`` differentiates through the
    recorded computation.
    """
    flat_ex, in_tree = jax.tree.flatten(example_args)

    def flat_fn(*flat):
        args = jax.tree.unflatten(in_tree, flat)
        return fn(*args)

    jaxpr, out_shape = jax.make_jaxpr(flat_fn, return_shape=True)(*flat_ex)
    out_tree = jax.tree.structure(out_shape)

    def wrapped(consts, *args):
        flat = jax.tree.leaves(args)
        outs = jax.core.eval_jaxpr(jaxpr.jaxpr, consts, *flat)
        return jax.tree.unflatten(out_tree, outs)

    # Commit the constants to the device ONCE: the tracer leaves many of them
    # as host arrays, and passing those through jit re-uploads them on every
    # call (measured: ~70 ms/call of hidden transfer on SMPL-X — the whole
    # point of hoisting is to pass them by device reference).
    return wrapped, jax.device_put(list(jaxpr.consts))


def get_fit_grad_fn(
    fitter: 'BodyFitter',
    chunk: Optional[int] = None,
    num_iter: int = 3,
    beta_regularizer: float = 1.0,
    final_adjust_rots: bool = True,
    use_kernels: bool = True,
    loss_fn=None,
):
    """The production recipe for differentiating THROUGH the fit.

    Returns ``vg(target_vertices, target_joints) -> (value, (g_tv, g_tj))``,
    the jitted value-and-grad of a scalar loss of the fit results (default:
    the summed squares of pose/betas/trans — pass ``loss_fn(result_dict)``
    for your own). Mirrors the differentiability contract of
    /root/reference/tests/pt/test_fitter_grad.py:1-60 at production batch
    sizes. Three ingredients make this compile and run fast (see
    docs/howto.md "Differentiate through the fit"):

    - :func:`hoist_constants`: model constants become jit parameters instead
      of inlined MLIR constants (99 MB -> 4 MB of MLIR at b32), and the fit
      records WITHOUT a JVP tracer so the fused-kernel path (custom-VJP
      backward kernels) is what gets differentiated;
    - monolithic by default (``chunk=None``): since the backward kernels
      halve their vertex chunk whenever the batch grid has more than one
      tile (``lbs_kernels._bwd_vc`` — double-buffered blocks + scratch
      exceeded scoped VMEM at full chunk), the whole b4096 forward+backward
      compiles and runs at full-batch kernel efficiency: 62.5 ms/batch
      value+grad on v5e (4.3x the forward fit; the chunked recipe measures
      89.7 ms at chunk 256, 107.7 at 128 — single-batch-tile grids cost ~3x
      per instance);
    - ``chunk``: fits are per-instance independent, so the summed loss (and
      its grad) decomposes exactly over batch chunks — pass e.g. 256 to
      bound residual memory on very large batches (the compiled program is
      ONE ``lax.scan``'d chunk-sized forward+backward). Applied when the
      batch is a larger multiple of ``chunk``.
    - per-shape caching: one hoist + jit per input shape, reused across calls.

    ``share_beta`` losses must NOT be chunked (chunking would break the
    cross-instance coupling) — the default monolithic mode is fine.
    """
    import numpy as np  # noqa: F401  (kept symmetrical with module style)

    def fit_loss(tv, tj):
        res = fitter.fit(
            tv, tj, num_iter=num_iter, beta_regularizer=beta_regularizer,
            final_adjust_rots=final_adjust_rots, use_kernels=use_kernels,
            requested_keys=('pose_rotvecs', 'shape_betas', 'trans'),
        )
        if loss_fn is not None:
            return loss_fn(res)
        return (
            jnp.sum(res['shape_betas'] ** 2)
            + jnp.sum(res['trans'] ** 2)
            + jnp.sum(res['pose_rotvecs'] ** 2)
        )

    def loss(tv, tj):
        B = tv.shape[0]
        if chunk and B > chunk and B % chunk == 0:
            n = B // chunk
            tvc = tv.reshape(n, chunk, *tv.shape[1:])
            tjc = tj.reshape(n, chunk, *tj.shape[1:])

            def body(acc, xs):
                return acc + fit_loss(*xs), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (tvc, tjc))
            return acc
        return fit_loss(tv, tj)

    cache: dict = {}

    def vg(tv, tj):
        tv = jnp.asarray(tv)
        tj = jnp.asarray(tj)
        key = (tv.shape, tj.shape)
        if key not in cache:
            loss_h, consts = hoist_constants(loss, tv, tj)
            vg_h = jax.jit(jax.value_and_grad(loss_h, argnums=(1, 2)))
            cache[key] = (vg_h, consts)
        vg_h, consts = cache[key]
        return vg_h(consts, tv, tj)

    return vg


@functools.lru_cache()
def get_cached_body_model(
    model_name: str = 'smpl', gender: str = 'neutral', model_root: Optional[str] = None
) -> BodyModel:
    """Return a cached BodyModel instance (shared; do not modify in place)."""
    return BodyModel(model_name=model_name, gender=gender, model_root=model_root)


@functools.lru_cache()
def get_cached_fit_fn(
    body_model_name: str = 'smpl',
    gender: str = 'neutral',
    num_betas: int = 10,
    enable_kid: bool = False,
    requested_keys: tuple = ('pose_rotvecs', 'shape_betas', 'trans'),
    beta_regularizer: float = 1.0,
    beta_regularizer2: float = 0.0,
    num_iter: int = 3,
    vertex_subset: Optional[tuple] = None,
    vertex_subset_size: Optional[int] = None,
    joint_regressor_post_lbs: Optional[tuple] = None,
    share_beta: bool = False,
    final_adjust_rots: bool = True,
    scale_target: bool = False,
    scale_fit: bool = False,
    scale_regularizer: float = 0.0,
    kid_regularizer: Optional[float] = None,
):
    """Build a jit-compiled fit closure for a fixed configuration.

    The returned function accepts ``(verts, joints=None, vertex_weights=None,
    joint_weights=None)`` with arbitrary leading batch dims and returns the
    requested keys reshaped accordingly. Passing/omitting the optional args
    selects among a small number of cached XLA executables.
    """
    import numpy as np

    body_model = BodyModel(
        model_name=body_model_name,
        gender=gender,
        num_betas=num_betas,
        vertex_subset=None if vertex_subset is None else list(vertex_subset),
        vertex_subset_size=vertex_subset_size,
        joint_regressor_post_lbs=(
            None
            if joint_regressor_post_lbs is None
            else np.asarray(joint_regressor_post_lbs)
        ),
    )
    fitter = BodyFitter(body_model, enable_kid=enable_kid)

    @functools.partial(jax.jit, static_argnames=())
    def fit_fn(verts, joints=None, vertex_weights=None, joint_weights=None,
               batch_mask=None):
        return fitter.fit(
            verts,
            target_joints=joints,
            vertex_weights=vertex_weights,
            joint_weights=joint_weights,
            num_iter=num_iter,
            beta_regularizer=beta_regularizer,
            beta_regularizer2=beta_regularizer2,
            scale_regularizer=scale_regularizer,
            kid_regularizer=kid_regularizer,
            share_beta=share_beta,
            final_adjust_rots=final_adjust_rots,
            scale_target=scale_target,
            scale_fit=scale_fit,
            requested_keys=requested_keys,
            batch_mask=batch_mask,
        )

    V = body_model.num_vertices
    J = body_model.num_joints

    def wrapped(verts, joints=None, vertex_weights=None, joint_weights=None):
        verts = jnp.asarray(verts)
        lead = verts.shape[:-2]
        verts_resh = verts.reshape(-1, V, 3)
        joints_resh = None if joints is None else jnp.asarray(joints).reshape(-1, J, 3)
        vw_resh = (
            None if vertex_weights is None else jnp.asarray(vertex_weights).reshape(-1, V)
        )
        jw_resh = (
            None if joint_weights is None else jnp.asarray(joint_weights).reshape(-1, J)
        )
        res = fit_fn(verts_resh, joints_resh, vw_resh, jw_resh)
        return {k: v.reshape(*lead, *v.shape[1:]) for k, v in res.items()}

    def ragged(verts_seqs, joints_seqs=None, vertex_weights_seqs=None,
               joint_weights_seqs=None):
        """Fit variable-length sequences in one bucketed call.

        The XLA analogue of the reference TF wrapper's RaggedTensor handling
        (/root/reference/src/smplfitter/tf/__init__.py:98-207) under static
        shapes: the sequences are flattened into one frame batch, padded up
        to the next power-of-two bucket (so the number of compiled
        executables stays logarithmic in the workload's size range), fit
        once, and split back per sequence. The padding frames replicate the
        last frame and are marked by a zero ``batch_mask``, which keeps
        ``share_beta`` exact (padding is excluded from the shared-Gramian
        sums); like the TF wrapper, ``share_beta`` couples ALL frames in the
        call, across sequences.

        Args are lists of per-sequence arrays: verts (T_i, V, 3), optional
        joints (T_i, J, 3), vertex weights (T_i, V), joint weights (T_i, J).
        Returns a dict mapping each requested key to a LIST of per-sequence
        arrays (T_i leading).
        """
        import numpy as np

        lengths = [int(v.shape[0]) for v in verts_seqs]
        n = sum(lengths)
        if n == 0:
            raise ValueError('ragged fit needs at least one frame')
        bucket = max(8, 1 << (n - 1).bit_length())
        pad = bucket - n

        def cat(seqs):
            flat = jnp.concatenate([jnp.asarray(s) for s in seqs], axis=0)
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.broadcast_to(flat[-1:], (pad, *flat.shape[1:]))],
                    axis=0,
                )
            return flat

        mask = jnp.asarray((np.arange(bucket) < n).astype(np.float32))
        res = fit_fn(
            cat(verts_seqs),
            None if joints_seqs is None else cat(joints_seqs),
            None if vertex_weights_seqs is None else cat(vertex_weights_seqs),
            None if joint_weights_seqs is None else cat(joint_weights_seqs),
            batch_mask=mask,
        )
        splits = np.cumsum([0] + lengths)
        return {
            k: [v[splits[i]:splits[i + 1]] for i in range(len(lengths))]
            for k, v in res.items()
        }

    wrapped.ragged = ragged
    return wrapped
