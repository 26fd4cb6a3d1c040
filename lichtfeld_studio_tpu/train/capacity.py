"""Gaussian-capacity bucketing.

Every per-gaussian cost (projection, Adam, noise, relocation, the N-side of
binning) scales with the STATIC capacity, not the live count — so training a
scene that starts at 30k gaussians inside a 1M buffer wastes ~all of that
work early on. The trainer starts with a small capacity bucket and grows it
(x2, one recompile per growth) as MCMC/ADC density approaches it. The
reference has no analog: its tensors are exactly-sized and pay reallocation
+ optimizer-surgery on every refine instead (mcmc.cpp:269-336).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.train.state import TrainState


def _pad_axis0(arr: jax.Array, new_c: int, fill: float = 0.0) -> jax.Array:
    c = arr.shape[0]
    if c >= new_c:
        return arr
    pad_width = ((0, new_c - c),) + ((0, 0),) * (arr.ndim - 1)
    return jnp.pad(arr, pad_width, constant_values=fill)


def grow_capacity(state: TrainState, new_capacity: int) -> TrainState:
    """Pad every per-gaussian leaf to `new_capacity` (dead-slot fills match
    SplatData.from_point_cloud's padding semantics)."""
    splats = state.splats
    c = splats.capacity
    if new_capacity <= c:
        return state

    rot_pad = jnp.zeros((new_capacity - c, 4), splats.rotation.dtype).at[:, 0].set(1.0)
    new_splats = dataclasses.replace(
        splats,
        means=_pad_axis0(splats.means, new_capacity),
        sh0=_pad_axis0(splats.sh0, new_capacity),
        shN=_pad_axis0(splats.shN, new_capacity),
        scaling=_pad_axis0(splats.scaling, new_capacity, fill=-10.0),
        rotation=jnp.concatenate([splats.rotation, rot_pad], axis=0),
        opacity=_pad_axis0(splats.opacity, new_capacity, fill=-15.0),
    )

    def pad_tree(tree):
        return jax.tree.map(lambda a: _pad_axis0(a, new_capacity), tree)

    adam = dataclasses.replace(
        state.adam,
        exp_avg=pad_tree(state.adam.exp_avg),
        exp_avg_sq=pad_tree(state.adam.exp_avg_sq),
    )
    return dataclasses.replace(
        state,
        splats=new_splats,
        adam=adam,
        densify_count=_pad_axis0(state.densify_count, new_capacity),
        densify_grad=_pad_axis0(state.densify_grad, new_capacity),
        admm_u=_pad_axis0(state.admm_u, new_capacity),
        admm_z=_pad_axis0(state.admm_z, new_capacity),
    )


def initial_capacity(n_init: int, max_cap: int, headroom: float = 2.0) -> int:
    """First bucket: power-of-two >= headroom * n_init, within [2^15, max_cap]."""
    target = max(int(n_init * headroom), 2**15)
    cap = 1 << (target - 1).bit_length()
    return min(cap, max_cap)
