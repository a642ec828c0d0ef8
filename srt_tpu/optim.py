"""Inverse-rendering optimizer driver.

The capability the reference's interactive loop never had: recover scene
parameters (sphere geometry, material coefficients, light parameters, mesh
vertices, camera pose) from target images by gradient descent through the
renderer.  Built on optax; supports sharded rendering over a device mesh
(gradients psum'd across shards) and periodic checkpointing.

Scene pytrees mix float leaves (differentiable) with bool/int leaves
(flags, indices); ``float_partition`` splits out the float subtree so
optimizers and grads never see non-inexact dtypes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def _is_float(x) -> bool:
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)


def float_partition(params: Any, trainable: Optional[Callable] = None
                    ) -> Tuple[List, Callable]:
    """Split a pytree into its trainable float leaves + a merge function.

    Returns (float_leaves, merge) where ``merge(new_float_leaves)``
    rebuilds the full pytree with non-selected leaves unchanged.
    ``trainable(path_str, leaf) -> bool`` further restricts which float
    leaves are optimized (e.g. ``lambda p, _: "albedo" in p`` for
    material-only recovery); None trains every float leaf.
    """
    with_path, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [leaf for _, leaf in with_path]
    float_idx = [
        i for i, (path, leaf) in enumerate(with_path)
        if _is_float(leaf)
        and (trainable is None or trainable(jax.tree_util.keystr(path), leaf))
    ]
    float_leaves = [leaves[i] for i in float_idx]

    def merge(new_float_leaves):
        out = list(leaves)
        for i, v in zip(float_idx, new_float_leaves):
            out[i] = v
        return jax.tree_util.tree_unflatten(treedef, out)

    return float_leaves, merge


@dataclasses.dataclass
class InverseRenderResult:
    params: Any
    losses: list
    steps: int


def make_train_step(loss_fn: Callable,
                    optimizer: optax.GradientTransformation,
                    merge: Callable,
                    project_fn: Optional[Callable] = None,
                    trainable: Optional[Callable] = None):
    """Jittable one-step update over float leaves.

    loss_fn(full_params, target, key) -> scalar;
    step(float_leaves, opt_state, target, key) -> (leaves, opt_state, loss).
    ``project_fn(full_params) -> full_params`` is applied after the update
    to keep parameters in their physical domain (e.g. roughness > 0) —
    without it, optimizers happily walk geometry/material parameters into
    regions where the renderer's gradients blow up.
    """

    def step(float_leaves, opt_state, target, key):
        def f(fl):
            return loss_fn(merge(fl), target, key)

        loss, grads = jax.value_and_grad(f)(float_leaves)
        updates, opt_state = optimizer.update(grads, opt_state, float_leaves)
        float_leaves = optax.apply_updates(float_leaves, updates)
        if project_fn is not None:
            projected = project_fn(merge(float_leaves))
            float_leaves, _ = float_partition(projected, trainable)
        return float_leaves, opt_state, loss

    return step


def clamp_sphere_scene(scene):
    """Default projection for Spheres scenes: colors to [0, 1], roughness
    to [1e-3, 1], metalness to [0, 1], radii positive."""
    import jax.numpy as jnp
    m = scene.materials
    return scene.replace(
        radius=jnp.maximum(scene.radius, 1e-3),
        materials=m.replace(
            albedo=jnp.clip(m.albedo, 0.0, 1.0),
            specular=jnp.clip(m.specular, 0.0, 1.0),
            roughness=jnp.clip(m.roughness, 1e-3, 1.0),
            metalness=jnp.clip(m.metalness, 0.0, 1.0),
        ),
    )


def run_inverse_rendering(
    render_fn: Callable,
    init_params: Any,
    target,
    key,
    steps: int = 200,
    learning_rate: float = 5e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss_fn: Optional[Callable] = None,
    project_fn: Optional[Callable] = None,
    trainable: Optional[Callable] = None,
    fixed_noise: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 50,
    log_every: int = 25,
    callback: Optional[Callable] = None,
) -> InverseRenderResult:
    """Full optimization loop with optional checkpoint/resume.

    render_fn(params, key) -> image; loss defaults to image MSE.  adam by
    default — image-MSE gradients are tiny (~1e-3) and plain SGD needs
    absurd learning rates.

    ``fixed_noise=True`` reuses ``key`` every step so the render is a
    deterministic function of the parameters — essential at low spp when
    the target was rendered with the same key (otherwise per-step sample
    noise floors the loss).  ``False`` decorrelates steps (fold_in of the
    step index), appropriate for real captured targets with enough spp.
    """
    from srt_tpu.utils import checkpoint as ckpt

    optimizer = optimizer or optax.adam(learning_rate)
    if loss_fn is None:
        def loss_fn(params, target, key):  # noqa: F811
            img = render_fn(params, key)
            return jnp.mean((img - target) ** 2)

    float_leaves, merge = float_partition(init_params, trainable)
    opt_state = optimizer.init(float_leaves)
    start_step = 0

    if checkpoint_path is not None:
        restored = ckpt.load(checkpoint_path)
        if restored is not None:
            float_leaves, opt_state, start_step = ckpt.restore_train_state(
                restored, float_leaves, opt_state
            )

    step_fn = jax.jit(
        make_train_step(loss_fn, optimizer, merge, project_fn, trainable)
    )

    losses = []
    for i in range(start_step, steps):
        step_key = key if fixed_noise else jax.random.fold_in(key, i)
        float_leaves, opt_state, loss = step_fn(
            float_leaves, opt_state, target, step_key
        )
        losses.append(float(loss))
        if log_every and i % log_every == 0:
            print(f"[inverse-render] step {i}: loss {float(loss):.4e}")
        if callback is not None:
            callback(i, merge(float_leaves), float(loss))
        if checkpoint_path is not None and (i + 1) % checkpoint_every == 0:
            ckpt.save_train_state(checkpoint_path, float_leaves, opt_state, i + 1)

    if checkpoint_path is not None:
        ckpt.save_train_state(checkpoint_path, float_leaves, opt_state, steps)
    return InverseRenderResult(
        params=merge(float_leaves), losses=losses, steps=steps
    )
