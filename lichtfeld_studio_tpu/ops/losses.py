"""Training losses (reference: trainer.cpp compute_* methods :103-170).

The reference calls loss.backward() five times (photometric, scale reg,
opacity reg, TV, sparsity — trainer.cpp:677-714); here they are summed into
one scalar so JAX differentiates the whole step once — identical gradients,
one fused backward."""

from __future__ import annotations

import jax.numpy as jnp

from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.ops.ssim import ssim


def photometric_loss(
    rendered: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float
) -> jnp.ndarray:
    """(1-λ)·L1 + λ·(1 − SSIM_valid)  (trainer.cpp:123-127)."""
    l1 = jnp.mean(jnp.abs(rendered - gt))
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim(rendered, gt))


def scale_reg_loss(splats: SplatData, scale_reg: float) -> jnp.ndarray:
    """scale_reg * mean(exp(scaling)) over live slots (trainer.cpp:139-143).

    The reference averages over N live gaussians; with static capacity we
    average over the live prefix using the traced count."""
    if scale_reg <= 0:
        return jnp.asarray(0.0)
    mask = splats.active_mask()
    total = jnp.sum(jnp.where(mask[:, None], splats.get_scaling(), 0.0))
    return scale_reg * total / jnp.maximum(splats.n_active * 3, 1)


def opacity_reg_loss(splats: SplatData, opacity_reg: float) -> jnp.ndarray:
    """opacity_reg * mean(sigmoid(opacity)) over live slots (trainer.cpp:155-159)."""
    if opacity_reg <= 0:
        return jnp.asarray(0.0)
    mask = splats.active_mask()
    total = jnp.sum(jnp.where(mask[:, None], splats.get_opacity(), 0.0))
    return opacity_reg * total / jnp.maximum(splats.n_active, 1)
