"""ADC ("default") densification strategy — functional, static-capacity.

Reference: src/training/strategies/default_strategy.cpp. The reference grows
and shrinks tensors (duplicate :49-85, split :87-162, remove :195-227,
reset_opacity :251-290) with optimizer-state surgery on every resize. TPU
redesign: fixed capacity with an n_active prefix —

* duplicate: scatter copies of selected gaussians into fresh slots;
* split: the original slot is overwritten in place with the first sample
  (scale/1.6, resampled position) and the second sample is appended, which is
  set-equivalent to the reference's remove+append-2 layout; Adam moments of
  split gaussians are zeroed (the reference appends them with zero state);
* prune: stable-partition live slots to the front (one argsort permutation
  applied to params + moments) instead of compaction by index_select;
* densification stats (visible-count + pixel-scaled mean2d grad-norm sums,
  kernels_backward.cuh:233-235) live as two [C] arrays in TrainState, fed by
  the mean2d gradient tap in ops.rasterize.

Capacity bound: the reference ADC is unbounded; a static buffer needs a cap,
so growth drops lowest-priority candidates once capacity is full (max_cap
config, default 1M — the MCMC cap, comfortably above ADC's typical counts).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.ops.adam import AdamState
from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat


def _logit(x):
    return jnp.log(x) - jnp.log1p(-x)


def _scatter_params(splats: SplatData, src_mask, dest, transform=None) -> SplatData:
    """Copy each masked gaussian's params to slot dest[i] (capacity-clipped).
    `transform` optionally maps (name, values[C, ...]) -> new values before
    the copy (for split's scale/opacity/mean edits)."""
    c = splats.capacity
    safe_dest = jnp.where(src_mask & (dest < c), dest, c)

    def put(name, arr):
        vals = arr
        if transform is not None:
            vals = transform(name, arr)
        return arr.at[safe_dest].set(vals, mode="drop")

    return splats.replace_trainable(
        {name: put(name, arr) for name, arr in splats.trainable_dict().items()}
    )


def grow_gs(
    key: jax.Array,
    splats: SplatData,
    adam: AdamState,
    densify_count: jax.Array,  # [C]
    densify_grad: jax.Array,  # [C]
    cfg,
) -> tuple[SplatData, AdamState]:
    """duplicate small / split large high-gradient gaussians
    (default_strategy.cpp:164-192 grow_gs, :49-162 duplicate/split)."""
    c = splats.capacity
    n = splats.n_active
    active = splats.active_mask()

    grads = densify_grad / jnp.maximum(densify_count, 1.0)
    is_high = (grads > cfg.grad_threshold) & active
    max_scale = jnp.max(splats.get_scaling(), axis=-1)
    is_small = max_scale <= cfg.grow_scale3d * splats.scene_scale
    dup = is_high & is_small
    split = is_high & ~is_small

    # --- duplicate: append copies ---
    d_rank = jnp.cumsum(dup.astype(jnp.int32)) - 1
    n_dup = jnp.sum(dup.astype(jnp.int32))
    dest_dup = n + d_rank
    splats = _scatter_params(splats, dup, dest_dup)

    # --- split: overwrite in place + append second sample ---
    rot = quat_to_rotmat(splats.rotation)  # [C, 3, 3]
    scale = splats.get_scaling()
    k1, k2 = jax.random.split(key)
    def sample(k):
        z = jax.random.normal(k, (c, 3))
        return jnp.sum(rot * (scale * z)[:, None, :], axis=-1)  # R @ (s*z)

    new_log_scale = jnp.log(jnp.maximum(scale / 1.6, 1e-20))
    if cfg.revised_opacity:
        # 1 - sqrt(1 - sigmoid(op))  (default_strategy.cpp:119-122)
        op = jax.nn.sigmoid(splats.opacity)
        new_opacity = _logit(jnp.clip(1.0 - jnp.sqrt(1.0 - op), 1e-7, 1 - 1e-7))
    else:
        new_opacity = splats.opacity

    s_rank = jnp.cumsum(split.astype(jnp.int32)) - 1
    dest_split = n + n_dup + s_rank

    def transform_b(name, arr):
        if name == "means":
            return arr + sample(k2)
        if name == "scaling":
            return new_log_scale
        if name == "opacity":
            return new_opacity
        return arr

    splats = _scatter_params(splats, split, dest_split, transform=transform_b)

    # in-place first sample
    split3 = split[:, None]
    splats = splats.replace_trainable(
        {
            **splats.trainable_dict(),
            "means": jnp.where(split3, splats.means + sample(k1), splats.means),
            "scaling": jnp.where(split3, new_log_scale, splats.scaling),
            "opacity": jnp.where(split3, new_opacity, splats.opacity),
        }
    )

    # zero Adam moments at in-place split slots (reference removes originals
    # and appends zero-state copies)
    def zero_at(tree, mask):
        def z(arr):
            m = mask.reshape((c,) + (1,) * (arr.ndim - 1))
            return jnp.where(m, 0.0, arr)

        return jax.tree.map(z, tree)

    adam = AdamState(
        exp_avg=zero_at(adam.exp_avg, split),
        exp_avg_sq=zero_at(adam.exp_avg_sq, split),
        step_count=adam.step_count,
        lr=adam.lr,
    )

    n_split = jnp.sum(split.astype(jnp.int32))
    new_n = jnp.minimum(n + n_dup + n_split, jnp.asarray(c, jnp.int32))
    return dataclasses.replace(splats, n_active=new_n), adam


def prune_gs(
    iteration: jax.Array, splats: SplatData, adam: AdamState, cfg
) -> tuple[SplatData, AdamState]:
    """Prune by opacity / degenerate quat / size, then stable-partition live
    slots to the front (default_strategy.cpp:229-249 + remove :195-227)."""
    c = splats.capacity
    active = splats.active_mask()
    op = jax.nn.sigmoid(splats.opacity[:, 0])
    qnorm = jnp.sum(splats.rotation**2, axis=-1)
    is_prune = (op < cfg.prune_opacity) | (qnorm < 1e-8)
    too_big = jnp.max(splats.get_scaling(), axis=-1) > cfg.prune_scale3d * splats.scene_scale
    is_prune = is_prune | ((iteration > cfg.reset_every) & too_big)
    keep = active & ~is_prune

    # stable partition: keepers first, in order
    perm = jnp.argsort(~keep, stable=True)
    new_n = jnp.sum(keep.astype(jnp.int32))
    in_prefix = jnp.arange(c) < new_n

    def permute_params(arr, dead_fill):
        out = arr[perm]
        m = in_prefix.reshape((c,) + (1,) * (arr.ndim - 1))
        return jnp.where(m, out, dead_fill)

    tr = splats.trainable_dict()
    new_tr = {
        "means": permute_params(tr["means"], 0.0),
        "sh0": permute_params(tr["sh0"], 0.0),
        "shN": permute_params(tr["shN"], 0.0),
        "scaling": permute_params(tr["scaling"], -10.0),
        "rotation": jnp.where(
            in_prefix[:, None], tr["rotation"][perm], jnp.asarray([1.0, 0, 0, 0])
        ),
        "opacity": permute_params(tr["opacity"], -15.0),
    }
    splats = dataclasses.replace(
        splats.replace_trainable(new_tr), n_active=new_n
    )

    def permute_tree(tree):
        def p(arr):
            m = in_prefix.reshape((c,) + (1,) * (arr.ndim - 1))
            return jnp.where(m, arr[perm], 0.0)

        return jax.tree.map(p, tree)

    adam = AdamState(
        exp_avg=permute_tree(adam.exp_avg),
        exp_avg_sq=permute_tree(adam.exp_avg_sq),
        step_count=adam.step_count,
        lr=adam.lr,
    )
    return splats, adam


def reset_opacity(splats: SplatData, adam: AdamState, cfg) -> tuple[SplatData, AdamState]:
    """Clamp opacities to 2*prune_opacity and zero the opacity moments
    (default_strategy.cpp:251-290)."""
    threshold = _logit(jnp.asarray(2.0 * cfg.prune_opacity))
    new_op = jnp.minimum(splats.opacity, threshold)
    splats = splats.replace_trainable({**splats.trainable_dict(), "opacity": new_op})
    adam = AdamState(
        exp_avg={**adam.exp_avg, "opacity": jnp.zeros_like(adam.exp_avg["opacity"])},
        exp_avg_sq={**adam.exp_avg_sq, "opacity": jnp.zeros_like(adam.exp_avg_sq["opacity"])},
        step_count=adam.step_count,
        lr=adam.lr,
    )
    return splats, adam


def is_refining(iteration: jax.Array, cfg) -> jax.Array:
    """default_strategy.cpp:31-35 (refine schedule lives in cfg.mcmc)."""
    return (
        (iteration > cfg.mcmc.start_refine)
        & (iteration % cfg.mcmc.refine_every == 0)
        & (iteration % cfg.reset_every >= cfg.pause_refine_after_reset)
    )


def post_backward(
    key: jax.Array,
    iteration: jax.Array,
    splats: SplatData,
    adam: AdamState,
    densify_count: jax.Array,
    densify_grad: jax.Array,
    cfg,
    *,
    refine: bool = False,
    sh_step: bool = False,
    reset: bool = False,
) -> tuple[SplatData, AdamState, jax.Array, jax.Array]:
    """SH schedule + grow/prune/reset (default_strategy.cpp:292-326).
    `refine`/`sh_step`/`reset` are static (the schedule is host-known;
    lax.cond would copy the full state through the branch — ~10x slower).
    Returns (splats, adam, densify_count, densify_grad) with the stats
    zeroed after each refine."""
    if sh_step:
        splats = splats.increment_sh_degree()

    if refine:
        splats, adam = grow_gs(key, splats, adam, densify_count, densify_grad, cfg)
        splats, adam = prune_gs(iteration, splats, adam, cfg)
        densify_count = jnp.zeros_like(densify_count)
        densify_grad = jnp.zeros_like(densify_grad)

    if reset:
        splats, adam = reset_opacity(splats, adam, cfg)
    return splats, adam, densify_count, densify_grad
