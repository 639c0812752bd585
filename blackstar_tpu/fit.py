"""Differentiable scene fitting (inverse rendering) — the "training" path.

The reference is forward-only. The BASELINE.json north star makes the new
framework *differentiable*: pixel gradients w.r.t. camera pose, disk
parameters, and black-hole mass, validated against finite differences. This
module packages that as a standard JAX training loop: an L2 image loss, an
optax optimiser, and a jittable ``train_step`` that runs sharded over a
device mesh (forward embarrassingly parallel over ray tiles; backward
all-reduces only the small parameter-gradient pytree).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from blackstar_tpu.config import SceneParams, StaticConfig
from blackstar_tpu.render import render


class TrainState(NamedTuple):
    params: SceneParams
    opt_state: Any
    step: jnp.ndarray  # () int32


def image_loss(
    params: SceneParams,
    static: StaticConfig,
    target: jnp.ndarray,
    star_grid=None,
    *,
    mesh=None,
    pyramid: int = 0,
) -> jnp.ndarray:
    """Mean-squared error between the rendered linear-RGB image and a target.

    Renders through the reverse-mode-capable march (the Pallas adjoint on
    TPU); with a ``mesh`` the forward shards rays over devices and the
    backward psums the parameter cotangents.

    ``pyramid > 0`` adds box-blurred comparison levels (radii 4, 8, 16, …):
    coarse scales supply long-range gradients when the rendered and target
    structures barely overlap (e.g. a badly misplaced disk), which plain
    per-pixel MSE cannot. ``target`` may be a tuple of precomputed pyramid
    levels ``(target, blur4, blur8, …)`` — see :func:`target_pyramid` — so a
    training loop doesn't re-blur the constant target every step.
    """
    if mesh is not None:
        from blackstar_tpu.parallel.render import render_sharded

        img = render_sharded(params, static, star_grid, mesh=mesh, differentiable=True)
    else:
        img = render(params, static, star_grid, differentiable=True)
    levels = None
    if isinstance(target, (tuple, list)):
        levels = list(target)
        pyramid = len(levels) - 1
        target = levels[0]
    target = target.astype(img.dtype)
    loss = jnp.mean((img - target) ** 2)
    if pyramid:
        from blackstar_tpu.ops.filters import box_blur

        for k in range(pyramid):
            r = 4 << k
            tb = (levels[k + 1].astype(img.dtype) if levels is not None
                  else box_blur(target, r, passes=1))
            loss = loss + jnp.mean((box_blur(img, r, passes=1) - tb) ** 2)
        loss = loss / (1 + pyramid)
    return loss


def target_pyramid(target: jnp.ndarray, pyramid: int):
    """Precompute the blurred comparison levels of a constant target once
    (radii 4, 8, …) — pass the result to ``image_loss``/``train_step`` as
    the target."""
    from blackstar_tpu.ops.filters import box_blur

    return (target,) + tuple(
        box_blur(target, 4 << k, passes=1) for k in range(pyramid)
    )


def trainable_mask(params: SceneParams, predicate) -> SceneParams:
    """A 0/1 pytree selecting which parameter leaves to optimise.

    ``predicate`` receives the dotted leaf path (e.g. ``".disk.outer"``,
    ``".camera.fov"``) and returns True for trainable leaves. Used to freeze
    degenerate directions (e.g. mass and fov both scale apparent size).
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [
        (jnp.ones_like(v) if predicate("".join(str(k) for k in path)) else jnp.zeros_like(v))
        for path, v in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_train_step(
    static: StaticConfig,
    optimizer: optax.GradientTransformation,
    star_grid=None,
    *,
    mesh=None,
    grad_mask: Optional[SceneParams] = None,
    pyramid: int = 0,
):
    """Build a jittable ``(state, target[, star_grid]) -> (state, loss)``
    update step. The optional third argument overrides the grid at call
    time — pass it there when jitting so the (possibly hundreds of MB)
    tables ride as a program argument instead of being baked in as
    constants (which blows compile-size limits at full catalogue scale)."""

    def train_step(
        state: TrainState, target: jnp.ndarray, grid=star_grid
    ) -> Tuple[TrainState, jnp.ndarray]:
        loss, grads = jax.value_and_grad(image_loss)(
            state.params, static, target, grid, mesh=mesh, pyramid=pyramid
        )
        if grad_mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, grad_mask)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def init_train_state(params: SceneParams, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params), step=jnp.int32(0))


def save_params(params: SceneParams, path: str) -> None:
    """Checkpoint a SceneParams pytree to ``.npz`` (resume support for long
    fitting runs — the reference's only persistence is the star tree)."""
    import numpy as np

    if not path.endswith(".npz"):
        # np.savez appends the suffix on save but np.load does not on load;
        # normalise so save_params/load_params agree on the final name.
        path = path + ".npz"
    leaves, treedef = jax.tree.flatten(params)
    np.savez(path, n=len(leaves), **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_params(path: str, like: SceneParams) -> SceneParams:
    """Restore a SceneParams checkpoint (``like`` supplies the tree shape)."""
    import numpy as np

    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path)
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(int(z["n"]))]
    return jax.tree.unflatten(jax.tree.structure(like), leaves)


def fit_scene(
    params: SceneParams,
    static: StaticConfig,
    target: jnp.ndarray,
    star_grid=None,
    *,
    steps: int = 100,
    learning_rate: float = 1e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
    mesh=None,
    jit: bool = True,
    callback=None,
    grad_mask: Optional[SceneParams] = None,
    pyramid: int = 0,
):
    """Gradient-descend scene parameters toward a target image.

    Returns ``(params, losses)``. This is the end-to-end capability the
    forward-only reference cannot express: recovering camera pose / disk
    shape / black-hole mass from an observed render. ``grad_mask`` (see
    :func:`trainable_mask`) restricts which leaves move; ``pyramid`` adds
    multi-scale loss levels for long-range convergence.
    """
    opt = optimizer or optax.adam(learning_rate)
    state = init_train_state(params, opt)
    if pyramid and not isinstance(target, (tuple, list)):
        target = target_pyramid(target, pyramid)
    step_fn = make_train_step(
        static, opt, mesh=mesh, grad_mask=grad_mask, pyramid=pyramid
    )
    if jit:
        step_fn = jax.jit(step_fn)
    losses = []
    for i in range(steps):
        state, loss = step_fn(state, target, star_grid)
        # Keep losses on device — a host sync per step would serialise the
        # loop (costly on tunneled TPUs). Callbacks receive the *device*
        # loss and pay the fetch only if/when they convert it.
        if callback is not None:
            callback(i, state, loss)
        losses.append(loss)
    # ONE stacked fetch: a float() per step would pay the tunneled-TPU
    # ~27 ms host round-trip serially for every step after the loop.
    return state.params, np.asarray(jnp.stack(losses)).tolist()
