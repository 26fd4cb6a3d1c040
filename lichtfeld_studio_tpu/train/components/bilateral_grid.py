"""Bilateral-grid appearance modeling.

Reference: src/training/components/bilateral_grid.cpp + the CUDA slice / TV
kernels (src/training/kernels/bilateral_grid_forward.cu:13-110,
bilateral_grid_tv.cu:12-80). Per-image [12, L, H, W] grids of 3x4 affine
color transforms, identity-initialized; `apply` trilinearly slices the grid
at (x/w, y/h, luminance) and applies the affine to the rendered RGB. On TPU
this is a pure-JAX gather+lerp, autodiffed — XLA fuses it with the loss.

Training: separate Adam (lr 2e-3) with a 1000-step warmup-exponential
schedule starting at 1% (reference trainer.cpp:78-91, scheduler.hpp:29-59).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

_C2G = jnp.asarray([0.299, 0.587, 0.114])  # bilateral_grid_forward.cu:11


def identity_grids(num_images: int, grid_w: int = 16, grid_h: int = 16, grid_l: int = 8) -> jax.Array:
    """[N, 12, L, H, W] grids initialized to the identity affine
    (bilateral_grid.cpp:84-93)."""
    eye = jnp.eye(4)[:3].reshape(-1)  # 12 values, row-major 3x4
    g = jnp.tile(eye[None, :, None, None, None], (num_images, 1, grid_l, grid_h, grid_w))
    return g.astype(jnp.float32)


def slice_grid(grid: jax.Array, rgb: jax.Array) -> jax.Array:
    """Apply one image's grid: grid [12, L, H, W], rgb [h, w, 3] in [0,1]
    -> [h, w, 3] (slice_forward_kernel semantics, uniform coords)."""
    h, w, _ = rgb.shape
    l, gh, gw = grid.shape[1], grid.shape[2], grid.shape[3]
    rgb_c = jnp.clip(rgb, 0.0, 1.0)

    ys, xs = jnp.mgrid[0:h, 0:w]
    gx = xs.astype(jnp.float32) / max(w - 1, 1)
    gy = ys.astype(jnp.float32) / max(h - 1, 1)
    gz = jnp.einsum("hwc,c->hw", rgb_c, _C2G, precision=jax.lax.Precision.HIGHEST)

    x = gx * (gw - 1)
    y = gy * (gh - 1)
    z = gz * (l - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, gw - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, gh - 1)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, l - 1)
    x1 = jnp.minimum(x0 + 1, gw - 1)
    y1 = jnp.minimum(y0 + 1, gh - 1)
    z1 = jnp.minimum(z0 + 1, l - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fz = (z - z0)[..., None]

    gT = grid.transpose(1, 2, 3, 0)  # [L, H, W, 12]

    def corner(zi, yi, xi):
        return gT[zi, yi, xi]  # [h, w, 12]

    c000 = corner(z0, y0, x0); c001 = corner(z0, y0, x1)
    c010 = corner(z0, y1, x0); c011 = corner(z0, y1, x1)
    c100 = corner(z1, y0, x0); c101 = corner(z1, y0, x1)
    c110 = corner(z1, y1, x0); c111 = corner(z1, y1, x1)
    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    affine = (c0 * (1 - fz) + c1 * fz).reshape(h, w, 3, 4)

    out = jnp.einsum(
        "hwck,hwk->hwc", affine[..., :3], rgb,
        precision=jax.lax.Precision.HIGHEST,
    ) + affine[..., 3]
    return out


def apply_bilateral_grid(grids: jax.Array, rgb: jax.Array, image_idx: jax.Array) -> jax.Array:
    """grids [N, 12, L, H, W], rgb [h, w, 3], image_idx [] int32."""
    return slice_grid(grids[image_idx], rgb)


def tv_loss(grids: jax.Array) -> jax.Array:
    """Total variation over (L, H, W), per-dimension normalized, averaged
    over channels and images (bilateral_grid_tv.cu:12-80)."""
    n, c, l, h, w = grids.shape

    def sq(x):
        return jnp.sum(x * x)

    dx = sq(grids[..., :, :, 1:] - grids[..., :, :, :-1]) / (l * h * max(w - 1, 1))
    dy = sq(grids[..., :, 1:, :] - grids[..., :, :-1, :]) / (l * max(h - 1, 1) * w)
    dz = sq(grids[..., 1:, :, :] - grids[..., :-1, :, :]) / (max(l - 1, 1) * h * w)
    return (dx + dy + dz) / (c * n)


def warmup_exponential_lr(
    base_lr: float, step: jax.Array, total_steps: int,
    warmup_steps: int = 1000, start_factor: float = 0.01, final_factor: float = 0.01,
) -> jax.Array:
    """Bilateral grid LR schedule (reference WarmupExponentialLR,
    scheduler.hpp:29-59): linear warmup from 1% over 1000 steps, then
    exponential decay to final_factor at total_steps."""
    step_f = step.astype(jnp.float32)
    warm = start_factor + (1.0 - start_factor) * jnp.minimum(step_f / warmup_steps, 1.0)
    decay_steps = max(total_steps - warmup_steps, 1)
    gamma = final_factor ** (1.0 / decay_steps)
    decay = jnp.where(
        step_f > warmup_steps, gamma ** (step_f - warmup_steps), 1.0
    )
    return base_lr * warm * decay
