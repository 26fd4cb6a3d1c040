"""MCMC densification strategy — functional, static-capacity.

Reference: src/training/strategies/mcmc.cpp. The reference mutates tensor
sizes (concat) and rebuilds optimizer state on every refine; here capacity is
fixed at `max_cap` and growth is "raise n_active and scatter into the fresh
slots", so the entire strategy is jit-compiled with zero recompiles:

* relocate_gs (mcmc.cpp:112-190): dead = opacity<=min or degenerate quat;
  every dead slot samples a source from the alive opacity distribution
  (inverse-CDF sampling — the reference's own >2^24 fallback algorithm, and
  the only shape-static formulation; torch::multinomial is O(N^2) memory as
  a Gumbel broadcast);
* add_new_gs (mcmc.cpp:192-347): grow 5% toward max_cap, new slots sample
  sources the same way; sources get relocation-split opacity/scale, new/dead
  slots copy the updated source params;
* optimizer-state semantics preserved: relocation zeroes moments at the
  sampled sources (mcmc.cpp:86-110); add_new keeps source moments and new
  slots start at zero (mcmc.cpp:300-320 — zeros-concat == our dead slots'
  already-zero moments);
* inject_noise (mcmc.cpp:349-367) every step with the *current* means lr.

Refine work compiles as a separate static step variant (see StepFlags in
train/state.py) — XLA lax.cond copies the full state through branches,
measured ~10x slower.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.ops.adam import AdamState
from lichtfeld_studio_tpu.ops.mcmc_ops import add_noise, make_binoms, relocation

NOISE_LR = 5e5  # reference mcmc.hpp:79


@dataclass(frozen=True)
class MCMCConfig:
    max_cap: int = 1_000_000
    min_opacity: float = 0.005
    start_refine: int = 500
    stop_refine: int = 25_000
    refine_every: int = 100
    sh_degree_interval: int = 1_000
    grow_factor: float = 1.05


def _sample_multinomial(key: jax.Array, probs: jax.Array, num: int) -> jax.Array:
    """`num` samples (with replacement) ~ probs via inverse-CDF search.
    probs need not be normalized; zero-prob entries are never chosen.
    method='sort' turns the binary search into a merge-by-sort — sorts are
    ~10x faster than vectorized binary search on TPU."""
    cdf = jnp.cumsum(probs)
    total = cdf[-1]
    u = jax.random.uniform(key, (num,)) * total
    idx = jnp.searchsorted(cdf, u, side="right", method="sort")
    return jnp.clip(idx, 0, probs.shape[0] - 1).astype(jnp.int32)


def _apply_relocation(
    splats: SplatData,
    adam: AdamState,
    target_mask: jax.Array,  # [C] bool — slots to overwrite (dead or new)
    src: jax.Array,  # [C] int32 — source per slot (only used where target)
    binoms: jax.Array,
    min_opacity: float,
    *,
    zero_source_moments: bool,
) -> tuple[SplatData, AdamState]:
    """Shared core of relocate/add_new: split each source `ratio` ways,
    write the updated opacity/scale back to the source, copy all params from
    source to target slots.

    Scatter-minimal formulation: the relocation update is a pure function of
    (opacity, scale, ratio) per GAUSSIAN, so it is evaluated for every slot
    (the [C,51] series rides the MXU) and applied with a select over ONE
    boolean source mask — value scatters over the params measured ~10x
    slower than the redundant compute."""
    c = splats.capacity
    opac = jax.nn.sigmoid(splats.opacity[:, 0])

    # ratio per source = 1 + (#targets sampling it)  (mcmc.cpp:144-150)
    occ = jax.ops.segment_sum(target_mask.astype(jnp.int32), src, num_segments=c)
    safe_src = jnp.where(target_mask, src, c)
    is_source = jnp.zeros((c,), jnp.bool_).at[safe_src].set(True, mode="drop")

    new_op_all, new_scales_all = relocation(
        opac, jnp.exp(splats.scaling), 1 + occ, binoms
    )
    new_op_all = jnp.clip(new_op_all, min_opacity, 1.0 - 1e-7)
    new_logit = jnp.log(new_op_all) - jnp.log1p(-new_op_all)
    new_log_scales = jnp.log(jnp.maximum(new_scales_all, 1e-20))

    # 1) update the sources in place (reference order: sources first)
    opacity1 = jnp.where(is_source[:, None], new_logit[:, None], splats.opacity)
    scaling1 = jnp.where(is_source[:, None], new_log_scales, splats.scaling)

    # 2) copy updated source params into target slots
    def copy_to_targets(arr):
        return jnp.where(
            target_mask.reshape((c,) + (1,) * (arr.ndim - 1)), arr[src], arr
        )

    new_splats = dataclasses.replace(
        splats,
        means=copy_to_targets(splats.means),
        sh0=copy_to_targets(splats.sh0),
        shN=copy_to_targets(splats.shN),
        rotation=copy_to_targets(splats.rotation),
        opacity=copy_to_targets(opacity1),
        scaling=copy_to_targets(scaling1),
    )

    if zero_source_moments:
        # reference zeroes exp_avg/exp_avg_sq at sampled sources
        # (mcmc.cpp:86-110) — bandwidth-cheap select over the source mask.
        def zero_src(tree):
            def z(arr):
                m = is_source.reshape((c,) + (1,) * (arr.ndim - 1))
                return jnp.where(m, 0.0, arr)

            return jax.tree.map(z, tree)

        adam = AdamState(
            exp_avg=zero_src(adam.exp_avg),
            exp_avg_sq=zero_src(adam.exp_avg_sq),
            step_count=adam.step_count,
            lr=adam.lr,
        )
    return new_splats, adam


def relocate_gs(
    key: jax.Array,
    splats: SplatData,
    adam: AdamState,
    binoms: jax.Array,
    cfg: MCMCConfig,
) -> tuple[SplatData, AdamState]:
    c = splats.capacity
    active = splats.active_mask()
    opac = jax.nn.sigmoid(splats.opacity[:, 0])
    qnorm = jnp.sum(splats.rotation**2, axis=-1)
    dead = active & ((opac <= cfg.min_opacity) | (qnorm < 1e-8))
    alive = active & ~dead

    probs = jnp.where(alive, opac, 0.0)
    src = _sample_multinomial(key, probs, c)  # one candidate source per slot
    has_alive = jnp.any(alive)
    target = dead & has_alive
    return _apply_relocation(
        splats, adam, target, src, binoms, cfg.min_opacity, zero_source_moments=True
    )


def add_new_gs(
    key: jax.Array,
    splats: SplatData,
    adam: AdamState,
    binoms: jax.Array,
    cfg: MCMCConfig,
) -> tuple[SplatData, AdamState]:
    c = splats.capacity
    n = splats.n_active
    n_target = jnp.minimum(
        jnp.asarray(cfg.max_cap, jnp.int32),
        (cfg.grow_factor * n.astype(jnp.float32)).astype(jnp.int32),
    )
    idx = jnp.arange(c, dtype=jnp.int32)
    new_mask = (idx >= n) & (idx < n_target)

    active = splats.active_mask()
    opac = jax.nn.sigmoid(splats.opacity[:, 0])
    probs = jnp.where(active, opac, 0.0)
    src = _sample_multinomial(key, probs, c)

    splats, adam = _apply_relocation(
        splats, adam, new_mask, src, binoms, cfg.min_opacity, zero_source_moments=False
    )
    splats = dataclasses.replace(splats, n_active=n_target)
    return splats, adam


def is_refining(iteration: jax.Array, cfg: MCMCConfig) -> jax.Array:
    return (
        (iteration < cfg.stop_refine)
        & (iteration > cfg.start_refine)
        & (iteration % cfg.refine_every == 0)
    )


def post_backward(
    key: jax.Array,
    iteration: jax.Array,  # [] int32, 1-based
    splats: SplatData,
    adam: AdamState,
    binoms: jax.Array,
    cfg: MCMCConfig,
    *,
    refine: bool = False,
    sh_step: bool = False,
) -> tuple[SplatData, AdamState]:
    """SH schedule + refine + noise (reference mcmc.cpp:369-393).
    `refine`/`sh_step` are static (the schedule is known on the host);
    lax.cond would copy the full state through the branch — ~10x slower."""
    if sh_step:
        splats = splats.increment_sh_degree()

    k_rel, k_add, k_noise = jax.random.split(key, 3)

    if refine:
        splats, adam = relocate_gs(k_rel, splats, adam, binoms, cfg)
        splats, adam = add_new_gs(k_add, splats, adam, binoms, cfg)

    current_lr = adam.lr["means"] * NOISE_LR
    new_means = add_noise(
        splats.opacity,
        splats.scaling,
        splats.rotation,
        splats.means,
        splats.active_mask(),
        k_noise,
        current_lr,
    )
    splats = dataclasses.replace(splats, means=new_means)
    return splats, adam
