"""Reference (oracle) alpha-blending — pure JAX, CPU-runnable, autodiffable.

This module is the analog of the reference's test oracle
(tests/torch_impl.cpp): an exact tensor-op reimplementation of the blend
semantics of blend_cu (fastgs/rasterization/include/kernels_forward.cuh:
356-461) used as ground truth for the Pallas fast path. Sequential
front-to-back compositing with early termination is rewritten as masked
prefix products, which is mathematically identical:

  * alpha_i = min(opacity * exp(-sigma/2), 0.999), zeroed when sigma/2 < 0
    or alpha < 1/255 (the kernel's `continue` branches);
  * running transmittance P_i = prod_{j<=i} (1 - alpha_j) is monotone
    non-increasing, so the kernel's `done` flag (next_T < 1e-4 -> stop before
    applying) is exactly the mask `counted_i = (P_i >= 1e-4)`;
  * final transmittance is the product over counted terms only.

Gradients: `counted` is a boolean gate, so autodiff matches the CUDA
backward's behavior of not differentiating through termination or the skip
branches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.ops.projection import (
    MAX_FRAGMENT_ALPHA,
    MIN_ALPHA_THRESHOLD,
    TRANSMITTANCE_THRESHOLD,
)


def compute_alphas(
    mean2d: jnp.ndarray,  # [..., K, 2]
    conic: jnp.ndarray,  # [..., K, 3] (a, b, c)
    opacity: jnp.ndarray,  # [..., K]
    px: jnp.ndarray,  # [..., P] pixel-center x
    py: jnp.ndarray,  # [..., P] pixel-center y
) -> jnp.ndarray:
    """Per (instance, pixel) alpha with the reference's skip masks applied.
    Returns [..., K, P]."""
    dx = mean2d[..., :, None, 0] - px[..., None, :]
    dy = mean2d[..., :, None, 1] - py[..., None, :]
    a = conic[..., :, None, 0]
    b = conic[..., :, None, 1]
    c = conic[..., :, None, 2]
    sigma_over_2 = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    gaussian = jnp.exp(-jnp.maximum(sigma_over_2, 0.0))
    alpha = jnp.minimum(opacity[..., :, None] * gaussian, MAX_FRAGMENT_ALPHA)
    keep = (sigma_over_2 >= 0.0) & (alpha >= MIN_ALPHA_THRESHOLD)
    return jnp.where(keep, alpha, 0.0)


def blend_along_axis(
    alphas: jnp.ndarray,  # [..., K, P] masked alphas in front-to-back order
    colors: jnp.ndarray,  # [..., K, 3] (unclamped; clamped to >=0 here)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite along axis -3 (the K axis). Returns (color [..., P, 3],
    transmittance [..., P])."""
    one_minus = 1.0 - alphas
    cum = jnp.cumprod(one_minus, axis=-2)  # P_i, [..., K, P]
    counted = cum >= TRANSMITTANCE_THRESHOLD
    t_before = jnp.concatenate(
        [jnp.ones_like(cum[..., :1, :]), cum[..., :-1, :]], axis=-2
    )
    w = jnp.where(counted, t_before * alphas, 0.0)  # [..., K, P]
    col = jnp.maximum(colors, 0.0)  # fetch-time clamp (kernels_forward.cuh:419)
    color_out = jnp.einsum(
        "...kp,...kc->...pc", w, col, precision=jax.lax.Precision.HIGHEST
    )
    t_final = jnp.prod(jnp.where(counted, one_minus, 1.0), axis=-2)
    return color_out, t_final


def rasterize_oracle(
    mean2d: jnp.ndarray,  # [N, 2]
    conic: jnp.ndarray,  # [N, 3]
    opacity: jnp.ndarray,  # [N]
    color: jnp.ndarray,  # [N, 3]
    depth: jnp.ndarray,  # [N]
    valid: jnp.ndarray,  # [N] bool
    *,
    width: int,
    height: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """O(N * pixels) dense oracle rasterizer (no tiling, no bbox culling —
    the bbox only skips alphas the masks already zero out).

    Returns (image [H, W, 3], alpha_map [H, W]). Background compositing
    happens outside, matching fast_rasterize (fast_rasterizer.cpp:63)."""
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf))
    mean2d = mean2d[order]
    conic = conic[order]
    op = jnp.where(valid[order], opacity[order], 0.0)
    col = color[order]

    ys, xs = jnp.mgrid[0:height, 0:width]
    px = xs.reshape(-1).astype(jnp.float32) + 0.5
    py = ys.reshape(-1).astype(jnp.float32) + 0.5

    alphas = compute_alphas(mean2d, conic, op, px, py)  # [N, P]
    color_out, t_final = blend_along_axis(alphas, col)
    image = color_out.reshape(height, width, 3)
    alpha_map = (1.0 - t_final).reshape(height, width)
    return image, alpha_map
