"""Training sparse convex post-LBS joint regressors for vertex subsets.

When fitting on a decimated vertex subset without given target joints, the
fitter needs a regressor mapping POSED subset vertices -> joints. This trains
one: rows are convex combinations (softplus-normalized), encouraged to be
sparse by an L-1/2 penalty, in two phases — dense training, then thresholding
small weights and fine-tuning the surviving ones. Functional analogue of
/root/reference/src/smplfitter/decimation/make_post_lbs_joint_regressors.py:56-134,
re-built as a single jitted optax/lax.scan loop over on-the-fly random body
batches (no dataloader needed — the body model IS the data generator).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.bodymodel import BodyModel, forward


def _sample_params(key, batch, num_joints, num_betas, pose_std, beta_std, dtype):
    k1, k2 = jax.random.split(key)
    pose = jax.random.normal(k1, (batch, num_joints * 3), dtype) * pose_std
    betas = jax.random.normal(k2, (batch, num_betas), dtype) * beta_std
    return pose, betas


def train_post_lbs_regressor(
    body_model: BodyModel,
    vertex_subset: np.ndarray,
    num_steps: int = 400,
    finetune_steps: int = 200,
    batch_size: int = 64,
    lr: float = 1e-1,
    sparsity_weight: float = 1e-5,
    keep_threshold: float = 1e-3,
    pose_std: float = 0.3,
    beta_std: float = 1.0,
    seed: int = 0,
) -> np.ndarray:
    """Learn a sparse convex (J, len(vertex_subset)) post-LBS joint regressor.

    Phase 1 trains dense softplus-normalized weights with an L-1/2 sparsity
    penalty; phase 2 zeroes weights below ``keep_threshold`` (after
    normalization) and fine-tunes the survivors under a fixed mask.
    """
    bm = body_model.data
    subset = jnp.asarray(np.asarray(vertex_subset, np.int64))
    J = bm.num_joints
    n_sub = len(vertex_subset)
    dtype = bm.v_template.dtype

    # Warm start from the pre-LBS regressor restricted to the subset.
    init = np.maximum(np.asarray(bm.J_regressor_post_lbs)[:, np.asarray(vertex_subset)], 0)
    init = init + 1e-3
    params0 = jnp.asarray(np.log(np.expm1(init)), dtype)  # inverse softplus

    def regressor(params, mask=None):
        w = jax.nn.softplus(params)
        if mask is not None:
            w = w * mask
        return w / jnp.sum(w, axis=1, keepdims=True)

    def batch_data(key):
        pose, betas = _sample_params(key, batch_size, J, bm.num_betas, pose_std,
                                     beta_std, dtype)
        res = forward(bm, pose_rotvecs=pose, shape_betas=betas)
        return res['vertices'][:, subset], res['joints']

    def loss_fn(params, key, mask):
        verts, joints = batch_data(key)
        w = regressor(params, mask)
        pred = jnp.einsum('jv,bvc->bjc', w, verts)
        mse = jnp.mean(jnp.sum((pred - joints) ** 2, axis=-1))
        sparsity = jnp.mean(jnp.sqrt(w + 1e-8))
        return mse + sparsity_weight * sparsity

    optimizer = optax.adam(lr)

    @jax.jit
    def train_phase(params, mask, steps_arr):
        # Per-step PRNG keys arrive via ``steps_arr`` (scanned).
        opt_state = optimizer.init(params)

        def step(carry, k):
            p, s = carry
            grads = jax.grad(loss_fn)(p, k, mask)
            updates, s = optimizer.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), None

        (params, _), _ = jax.lax.scan(step, (params, opt_state), steps_arr)
        return params

    keys1 = jax.random.split(jax.random.PRNGKey(seed), num_steps)
    params = train_phase(params0, jnp.ones((J, n_sub), dtype), keys1)

    # Threshold and fine-tune under a fixed sparsity mask.
    w = np.asarray(regressor(params))
    mask = jnp.asarray((w > keep_threshold).astype(np.float32))
    keys2 = jax.random.split(jax.random.PRNGKey(seed + 1), finetune_steps)
    params = train_phase(params, mask, keys2)

    return np.asarray(regressor(params, mask))


def make_vertex_subset_assets(
    body_model: BodyModel,
    subset_size: int,
    model_root: str,
    **train_kwargs,
) -> tuple:
    """Create and save both subset files for a model: ``vertex_subset_{n}.npz``
    and ``vertex_subset_joint_regr_post_lbs_{n}.npy``."""
    import os.path as osp

    from .decimation import decimate

    v_template = np.asarray(body_model.data.v_template)
    faces = np.asarray(body_model.faces)
    subset, dec_faces = decimate(v_template, faces, subset_size)
    np.savez(
        osp.join(model_root, f'vertex_subset_{subset_size}.npz'),
        i_verts=subset,
        faces=dec_faces,
    )
    regressor = train_post_lbs_regressor(body_model, subset, **train_kwargs)
    np.save(
        osp.join(model_root, f'vertex_subset_joint_regr_post_lbs_{subset_size}.npy'),
        regressor,
    )
    return subset, regressor
