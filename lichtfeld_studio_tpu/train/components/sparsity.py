"""ADMM opacity sparsification.

Reference: src/training/components/sparsity_optimizer.{cpp,hpp}:21-145.
After base training, an ADMM penalty drives `prune_ratio` of the opacities
toward zero over `sparsify_steps` iterations, then the lowest-opacity
gaussians are pruned:

  loss      = rho/2 * || sigmoid(op) - z + u ||^2          (:58-62)
  z-update  = Pi_sparse(sigmoid(op) + u)   every 50 iters  (:85-90)
  u-update  = u + sigmoid(op) - z                          (:91)

Pi_sparse zeroes the smallest `prune_ratio` fraction. With a static-capacity
model the top-k is computed with a sort over the live prefix.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

UPDATE_EVERY = 50  # reference trainer.cpp:744-754 dual update cadence


@partial(jax.tree_util.register_dataclass, data_fields=["u", "z"], meta_fields=[])
@dataclass
class ADMMState:
    u: jax.Array  # [C]
    z: jax.Array  # [C]


def _prune_z(values: jax.Array, active: jax.Array, prune_ratio: float, n_active: jax.Array) -> jax.Array:
    """Project onto the sparsity set: zero the smallest prune_ratio fraction
    of the live entries (sparsity_optimizer.cpp prune_z)."""
    n_prune = (prune_ratio * n_active.astype(jnp.float32)).astype(jnp.int32)
    # rank of each live value among live values (ascending)
    key = jnp.where(active, values, jnp.inf)
    order = jnp.argsort(key)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0], dtype=jnp.int32))
    keep = ranks >= n_prune
    return jnp.where(keep & active, values, 0.0)


def init_admm(opacities_logit: jax.Array, active: jax.Array, n_active: jax.Array, prune_ratio: float) -> ADMMState:
    opa = jax.nn.sigmoid(opacities_logit[:, 0])
    opa = jnp.where(active, opa, 0.0)
    u = jnp.zeros_like(opa)
    z = _prune_z(opa + u, active, prune_ratio, n_active)
    return ADMMState(u=u, z=z)


def sparsity_loss(opacities_logit: jax.Array, active: jax.Array, state: ADMMState, rho: float) -> jax.Array:
    opa = jax.nn.sigmoid(opacities_logit[:, 0])
    diff = jnp.where(active, opa - jax.lax.stop_gradient(state.z) + jax.lax.stop_gradient(state.u), 0.0)
    return 0.5 * rho * jnp.sum(diff * diff)


def update_admm(
    opacities_logit: jax.Array, active: jax.Array, n_active: jax.Array,
    state: ADMMState, prune_ratio: float,
) -> ADMMState:
    opa = jnp.where(active, jax.nn.sigmoid(opacities_logit[:, 0]), 0.0)
    z = _prune_z(opa + state.u, active, prune_ratio, n_active)
    u = state.u + opa - z
    return ADMMState(u=u, z=z)


def prune_mask(opacities_logit: jax.Array, active: jax.Array, n_active: jax.Array, prune_ratio: float) -> jax.Array:
    """True for the `prune_ratio` fraction with the smallest opacity
    (sparsity_optimizer.cpp:107-135)."""
    opa = jax.nn.sigmoid(opacities_logit[:, 0])
    n_prune = (prune_ratio * n_active.astype(jnp.float32)).astype(jnp.int32)
    key = jnp.where(active, opa, jnp.inf)
    order = jnp.argsort(key)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0], dtype=jnp.int32))
    return active & (ranks < n_prune)
