"""Sharded training for the learned-flow models (RAFT-small flagship).

The reference ships no training (inference-only, SURVEY.md intro); the TPU
build makes the kernels differentiable (ops.correlation custom_vjp) and
provides the standard RAFT supervised recipe: sequence loss
``sum_i gamma^(N-i) * |flow_i - gt|`` over GRU iterations, AdamW, gradient
clipping.

Sharding: batch on the mesh 'data' axis, image height on 'model' (spatial
parallelism — XLA SPMD inserts conv halo exchanges), params replicated,
gradients all-reduced by XLA from the jit output sharding spec.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import RAFTSmall


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 4e-4, weight_decay: float = 1e-5, clip: float = 1.0):
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def make_train_state(model: RAFTSmall, rng, img_shape=(64, 64), lr: float = 4e-4):
    i = jnp.zeros(img_shape + (3,), jnp.float32)
    params = model.init(rng, i, i, 2)
    tx = make_optimizer(lr)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def sequence_loss(flows: jax.Array, gt: jax.Array, gamma: float = 0.8) -> jax.Array:
    """flows [iters, H, W, 2], gt [H, W, 2]."""
    n = flows.shape[0]
    weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
    err = jnp.abs(flows - gt[None]).mean(axis=(1, 2, 3))
    return jnp.sum(weights * err)


def train_step(model: RAFTSmall, tx, state: TrainState, batch, iters: int = 4):
    """batch: dict(img1, img2 [B,H,W,3], flow [B,H,W,2])."""

    def loss_fn(params):
        def one(i1, i2, gt):
            flows = model.apply(params, i1, i2, iters)
            return sequence_loss(flows, gt)

        return jnp.mean(jax.vmap(one)(batch["img1"], batch["img2"], batch["flow"]))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def make_sharded_train_step(
    model: RAFTSmall, tx, mesh: Mesh, iters: int = 4, shard_spatial: bool = True
):
    """jit the train step with explicit input/output shardings over ``mesh``:
    batch on 'data', H on 'model' (when shard_spatial), params replicated."""
    repl = NamedSharding(mesh, P())
    if shard_spatial and mesh.shape["model"] > 1:
        img_s = NamedSharding(mesh, P("data", "model"))
    else:
        img_s = NamedSharding(mesh, P("data"))

    step = functools.partial(train_step, model, tx, iters=iters)
    return jax.jit(
        step,
        in_shardings=(repl, {"img1": img_s, "img2": img_s, "flow": img_s}),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
