"""Tiled blend — pure-JAX scalable path (and the Pallas kernel's reference).

Consumes the laid-out instance buffer from ops.tiles and composites each 16x16
tile over its depth-ordered instance range, exactly like blend_cu
(fastgs/rasterization/include/kernels_forward.cuh:356-461) but expressed as
a dense [tiles, K_max] gather + masked prefix products instead of
shared-memory batching. Differentiable end-to-end by autodiff (the gather's
transpose is a scatter-add, standing in for the CUDA backward's atomics).

This path materializes [T, K_max, P] alphas, so it is the *fallback*: the
Pallas kernel (kernels/blend_pallas.py) implements the same math with
chunked streaming and early termination. K_max bounds per-tile work; deeper
tiles are truncated (back-most instances dropped — they are the ones the
early-termination test would skip anyway)."""

from __future__ import annotations

import jax.numpy as jnp

from lichtfeld_studio_tpu.ops.blend_ref import blend_along_axis, compute_alphas
from lichtfeld_studio_tpu.ops.tiles import TileAssignment


def blend_tiles(
    feat: jnp.ndarray,  # [I, 16] packed instance features (ops.tiles layout)
    assignment: TileAssignment,
    *,
    grid_w: int,
    grid_h: int,
    tile_size: int,
    k_max: int,
    n_channels: int = 3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (image [grid_h*ts, grid_w*ts, n_channels], alpha_map [...])."""
    ts = tile_size
    num_tiles = grid_w * grid_h
    i_cap = feat.shape[0]

    start = assignment.tile_start  # [T]
    count = jnp.minimum(assignment.tile_count, k_max)  # [T]

    k = jnp.arange(k_max, dtype=jnp.int32)  # [K]
    idx = jnp.clip(start[:, None] + k[None, :], 0, i_cap - 1)  # [T, K]
    in_range = k[None, :] < count[:, None]

    f = feat[idx]  # [T, K, 16]
    mean2d = f[..., 0:2]
    conic = f[..., 2:5]
    opac = jnp.where(in_range, f[..., 5], 0.0)
    colors = f[..., 8 : 8 + n_channels]  # [T, K, C]

    # per-tile pixel centers
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = (tile_ids % grid_w).astype(jnp.float32) * ts
    ty = (tile_ids // grid_w).astype(jnp.float32) * ts
    jj, ii = jnp.meshgrid(jnp.arange(ts), jnp.arange(ts), indexing="ij")  # row, col
    px = tx[:, None] + ii.reshape(-1)[None, :].astype(jnp.float32) + 0.5  # [T, P]
    py = ty[:, None] + jj.reshape(-1)[None, :].astype(jnp.float32) + 0.5

    alphas = compute_alphas(mean2d, conic, opac, px, py)  # [T, K, P]
    color_out, t_final = blend_along_axis(alphas, colors)  # [T, P, C], [T, P]

    image = (
        color_out.reshape(grid_h, grid_w, ts, ts, n_channels)
        .transpose(0, 2, 1, 3, 4)
        .reshape(grid_h * ts, grid_w * ts, n_channels)
    )
    alpha_map = (
        (1.0 - t_final)
        .reshape(grid_h, grid_w, ts, ts)
        .transpose(0, 2, 1, 3)
        .reshape(grid_h * ts, grid_w * ts)
    )
    return image, alpha_map
