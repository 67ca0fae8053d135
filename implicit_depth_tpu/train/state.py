"""Train state, optimizer, and jitted step functions.

Replaces the Lightning trainer plumbing (train_bd.py:145-159,
bd_model.py:700-723) with:
- optax AdamW (decoupled wd, torch semantics) + the reference's stepped
  LR schedule (x1 / x0.1 / x0.01 at lr_steps),
- a pure train_step(state, batch, rng) -> (state, metrics) that jit+
  GSPMD shards over the mesh `data` axis (gradient all-reduce is
  inserted by XLA; no hand-written collectives needed for DP parity),
- flip augmentation + BD ray-target assembly inside the step.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from implicit_depth_tpu.ops import image as image_ops
from implicit_depth_tpu.train import losses as loss_lib

Array = jnp.ndarray


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def stepped_lr(base_lr: float, lr_steps) -> optax.Schedule:
    """x1 until lr_steps[0], x0.1 until lr_steps[1], x0.01 after
    (bd_model.py:711-717)."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(lr_steps[0]): 0.1, int(lr_steps[1]): 0.1}
    )


def make_optimizer(lr: float = 1e-4, wd: float = 1e-4, lr_steps=(70000, 80000)) -> optax.GradientTransformation:
    return optax.adamw(stepped_lr(lr, lr_steps), weight_decay=wd)


def create_train_state(variables: dict, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def make_bd_train_step(
    net,
    *,
    pos_weight: float = 1.0,
    regularisation_weight: float = 0.5,
    edge_regularisation: bool = True,
    train_flip: bool = True,
    forward_only: bool = False,
) -> Callable:
    """Builds the BD training step (bd_model.py:647-694).

    batch = (cur_data, src_data) with cur_data carrying gt_depth,
    sampled_rays, sampled_depths (see BDNet docstring).
    forward_only=True evaluates the loss without grads/update — the
    profiling probe of scripts/profile_train.py, not a training mode.
    """

    def step(state: TrainState, batch, rng) -> tuple[TrainState, dict]:
        cur_data, src_data = batch
        rng_flip, rng_aug = jax.random.split(rng)
        flip = (
            jax.random.bernoulli(rng_flip) if train_flip else jnp.asarray(False)
        )

        # edge mask for the sharpness regulariser, sampled at the rays
        # (bd_model.py:338-346)
        edge_at_rays = None
        if edge_regularisation:
            gt = cur_data["gt_depth"]
            hg, wg = gt.shape[1], gt.shape[2]
            edge_full = image_ops.get_edge_mask(gt)
            rays = cur_data["sampled_rays"]
            grid = jnp.stack(
                [(rays[..., 0] / wg - 0.5) * 2, (rays[..., 1] / hg - 0.5) * 2], -1
            )
            from implicit_depth_tpu.core.sampling import grid_sample

            edge_at_rays = grid_sample(edge_full, grid[:, :, None], mode="nearest")[:, :, 0, 0]
            edge_at_rays = edge_at_rays[..., None]  # (b, N, 1) broadcast over S

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = net.apply(
                variables, cur_data, src_data, flip=flip,
                rngs={"aug": rng_aug},
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            preds = {k: v for k, v in out.items() if k.startswith("pred_")}
            losses = loss_lib.binary_losses(
                out["query_depth"],
                out["target_depth"][..., None],
                preds,
                pos_weight=pos_weight,
                regularisation_weight=regularisation_weight,
                edge_mask=edge_at_rays,
            )
            new_bs = mutated.get("batch_stats", state.batch_stats)
            return losses["loss"], (new_bs, losses)

        if forward_only:
            _, (_, losses) = loss_fn(state.params)
            return state, losses
        (loss, (new_bs, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, losses

    return step


def make_regression_train_step(net, *, dataset: str = "scannet", train_flip: bool = True) -> Callable:
    """Regression training step (depth_model.py:442-540, 542-663).
    Computes GT normals from depth on the fly (depth_model.py:565-570)."""

    def step(state: TrainState, batch, rng) -> tuple[TrainState, dict]:
        cur_data, src_data = batch
        flip = jax.random.bernoulli(rng) if train_flip else jnp.asarray(False)

        cur_data = dict(cur_data)
        depth_nan = jnp.where(cur_data["mask"], cur_data["depth"], jnp.nan)
        cur_data["normals"] = image_ops.normals_from_depth(
            jnp.nan_to_num(depth_nan, nan=0.0), cur_data["invK_s0"]
        )

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = net.apply(
                variables, cur_data, src_data, flip=flip,
                mutable=["batch_stats"] if state.batch_stats else [],
            )
            out = dict(out)
            out["normals_pred"] = image_ops.normals_from_depth(
                out["depth_pred_0"], cur_data["invK_s0"]
            )
            losses = loss_lib.regression_losses(cur_data, src_data, out, dataset=dataset)
            new_bs = mutated.get("batch_stats", state.batch_stats)
            return losses["loss"], (new_bs, losses)

        (loss, (new_bs, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        return new_state, losses

    return step
