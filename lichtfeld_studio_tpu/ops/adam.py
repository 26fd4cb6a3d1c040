"""Per-group Adam with masked (selective) updates — the FusedAdam equivalent.

Reference: src/training/optimizers/fused_adam.{cpp,hpp} + the adam_step_cu
kernel (fastgs/optimizer/adam_kernels.cuh:13-37). On TPU a hand-fused kernel
buys nothing: the whole update is one elementwise XLA fusion. What we do keep
from the reference:

  * per-param-group learning rates (means/sh0/shN/scaling/rotation/opacity,
    mcmc.cpp:487-492), carried as a pytree of traced scalars so the
    ExponentialLR schedule multiplies them inside jit;
  * eps=1e-15, betas=(0.9, 0.999) (mcmc.cpp:485-486);
  * the shN skip heuristic — shN updates are skipped while iter <= 1000
    (fused_adam.cpp:69-71; higher-degree SH is unused then). Note the
    reference increments step_count *before* the skip check, so the count
    advances even on skipped steps — replicated here. The optional
    every-2nd-step skip (SKIP_SH_STEPS) is compile-time disabled in the
    reference and omitted;
  * per-group step counts for bias correction.

Densification's "optimizer-state surgery" (strategy_utils.cpp) becomes plain
scatter/gather on the moment pytrees — see train/strategies.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["exp_avg", "exp_avg_sq", "step_count", "lr"],
    meta_fields=[],
)
@dataclass
class AdamState:
    exp_avg: dict  # pytree matching params
    exp_avg_sq: dict
    step_count: dict  # per-group [] int32
    lr: dict  # per-group [] float32 (traced so schedules stay in-jit)


BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


def init_adam(params: dict, lrs: dict[str, float]) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(
        exp_avg=zeros,
        exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
        step_count={k: jnp.asarray(0, jnp.int32) for k in params},
        lr={k: jnp.asarray(v, jnp.float32) for k, v in lrs.items()},
    )


def adam_step(
    params: dict,
    grads: dict,
    state: AdamState,
    *,
    skip: dict[str, jax.Array] | None = None,
    static_skip: tuple[str, ...] = (),
) -> tuple[dict, AdamState]:
    """One Adam step. `skip[k]` is an optional traced bool freezing group k
    this iteration (shN heuristic / sparsity phases). `static_skip` freezes
    groups at COMPILE time — the update is omitted entirely (the reference
    skips the kernel launch, fused_adam.cpp:69-71; a traced select still
    pays the full moment read/write traffic) — only the step count
    advances, matching the reference's count-then-skip order."""
    new_params, new_m, new_v, new_c = {}, {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        m, v = state.exp_avg[k], state.exp_avg_sq[k]
        c = state.step_count[k]
        if k in static_skip:
            new_params[k] = p
            new_m[k] = m
            new_v[k] = v
            new_c[k] = c + 1  # advances even when skipped
            continue
        do = jnp.asarray(True) if skip is None or k not in skip else ~skip[k]
        c1 = c + 1  # advances even when skipped (fused_adam.cpp:66-71)
        t = c1.astype(jnp.float32)
        bc1 = 1.0 - BETA1**t
        bc2 = 1.0 - BETA2**t
        step_size = state.lr[k] * jnp.sqrt(bc2) / bc1

        # each group may be a single array or a nested pytree (e.g. pose MLP)
        m1 = jax.tree.map(lambda mm, gg: BETA1 * mm + (1.0 - BETA1) * gg, m, g)
        v1 = jax.tree.map(lambda vv, gg: BETA2 * vv + (1.0 - BETA2) * gg * gg, v, g)
        upd = jax.tree.map(
            lambda pp, mm, vv: pp - step_size * mm / (jnp.sqrt(vv) + EPS), p, m1, v1
        )
        new_params[k] = jax.tree.map(lambda a, b: jnp.where(do, a, b), upd, p)
        new_m[k] = jax.tree.map(lambda a, b: jnp.where(do, a, b), m1, m)
        new_v[k] = jax.tree.map(lambda a, b: jnp.where(do, a, b), v1, v)
        new_c[k] = c1
    return new_params, AdamState(new_m, new_v, new_c, state.lr)


def shn_skip_mask(iteration: jax.Array) -> dict[str, jax.Array]:
    """The FusedAdam shN heuristic (fused_adam.cpp:69-71): frozen for the
    first 1000 iterations (higher-degree SH is not yet active)."""
    return {"shN": iteration <= 1000}


def scale_lrs(state: AdamState, gamma: jax.Array, groups: tuple[str, ...] | None = None) -> AdamState:
    """ExponentialLR step (reference scheduler.hpp:11-59): lr *= gamma for the
    selected groups (None = all, matching per-group index -1)."""
    new_lr = {
        k: (v * gamma if groups is None or k in groups else v)
        for k, v in state.lr.items()
    }
    return AdamState(state.exp_avg, state.exp_avg_sq, state.step_count, new_lr)
