"""Tile binning: instance expansion, composite-key sort, tile ranges.

TPU re-derivation of the fastgs binning pipeline
(fastgs/rasterization/src/forward.cu:15-199: preprocess counters -> cub
radix sort by depth -> exclusive scan -> create_instances -> radix sort by
tile key -> range extraction). The CUDA version relies on atomics, device
compaction, and two radix sorts with D2H counter readbacks (sync points at
forward.cu:99-101,175).

Here the same dataflow is expressed with static shapes and zero host syncs:

1. `n_touched` per gaussian -> exclusive cumsum gives each gaussian's segment
   in a fixed-capacity instance buffer.
2. Each instance slot finds its owning gaussian with a vectorized binary
   search (searchsorted) over the offsets — no scatter, no atomics.
3. ONE lexicographic two-key sort (tile_id, depth_bits) — both int32 —
   replaces the reference's dual radix sort: positive-float depth bits are
   monotonic as int32, so the single pass depth-orders instances within each
   tile. Invalid slots get tile_id = num_tiles and sort to the end.
4. Per-tile [start, end) ranges come from two searchsorted passes over the
   sorted tile ids (replacing extract_instance_ranges_cu).

Overflow policy: when total instances exceed `instance_cap`, trailing
instances (in gaussian order) are dropped and `n_instances` still reports the
true total so the trainer can warn/grow buffers between steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.ops.projection import ProjectedSplats


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["gaussian_idx", "tile_id", "tile_start", "tile_count", "n_instances", "instance_valid"],
    meta_fields=[],
)
@dataclass
class TileAssignment:
    gaussian_idx: jax.Array  # [I] int32 — owning gaussian per sorted instance
    tile_id: jax.Array  # [I] int32 — tile per sorted instance
    tile_start: jax.Array  # [T] int32 — first sorted-instance index per tile
    tile_count: jax.Array  # [T] int32 — instances per tile
    n_instances: jax.Array  # [] int32 — true instance total (may exceed I)
    instance_valid: jax.Array  # [I] bool


def _depth_key_bits(depth: jax.Array) -> jax.Array:
    """Monotonic uint32 ordering key for positive float32 depths
    (the reference reinterprets the float bits the same way,
    kernels_forward.cuh:199)."""
    return jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)


def build_tile_assignment(
    proj: ProjectedSplats,
    *,
    grid_w: int,
    grid_h: int,
    instance_cap: int,
) -> TileAssignment:
    n_touched = proj.n_touched  # [C] int32, 0 for culled
    c = n_touched.shape[0]
    num_tiles = grid_w * grid_h

    offsets = jnp.cumsum(n_touched) - n_touched  # exclusive prefix sum [C]
    total = offsets[-1] + n_touched[-1]

    # --- instance slot -> owning gaussian via binary search ---
    slot = jnp.arange(instance_cap, dtype=jnp.int32)
    g = jnp.searchsorted(offsets, slot, side="right").astype(jnp.int32) - 1
    g = jnp.clip(g, 0, c - 1)
    rank = slot - offsets[g]
    inst_valid = (slot < total) & (rank < n_touched[g])

    # --- tile coordinates within the gaussian's bbox ---
    bbox = proj.bbox[g]  # [I, 4]
    bb_w = jnp.maximum(bbox[:, 1] - bbox[:, 0], 1)
    t_x = bbox[:, 0] + rank % bb_w
    t_y = bbox[:, 2] + rank // bb_w
    tile = t_y * grid_w + t_x
    tile = jnp.clip(tile, 0, num_tiles - 1)
    tile = jnp.where(inst_valid, tile, num_tiles)  # invalid -> end of sort

    # --- lexicographic (tile, depth) sort ---
    depth_bits = _depth_key_bits(proj.depth)[g]
    tile_sorted, _, g_sorted, valid_sorted = jax.lax.sort(
        (tile, depth_bits, g, inst_valid), dimension=0, num_keys=2
    )

    # --- per-tile ranges ---
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tiles, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tiles, side="right").astype(jnp.int32)

    return TileAssignment(
        gaussian_idx=g_sorted,
        tile_id=tile_sorted,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        n_instances=total.astype(jnp.int32),
        instance_valid=valid_sorted,
    )


def pad_tile_ranges(assignment: TileAssignment, chunk: int) -> TileAssignment:
    """Re-layout the sorted instance buffer so every tile's range starts at a
    multiple of `chunk` (slack slots are invalid).

    This is what lets the Pallas backward kernel stream whole-chunk DMA
    writebacks without ever touching another tile's gradients, and makes
    every forward DMA aligned. The returned buffer has static capacity
    I + num_tiles * chunk (worst-case slack).
    """
    start, count = assignment.tile_start, assignment.tile_count
    i_cap = assignment.gaussian_idx.shape[0]
    num_tiles = start.shape[0]
    padded_counts = -(-count // chunk) * chunk  # [T]
    new_start = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)
    i_pad = i_cap + num_tiles * chunk  # static worst case

    slot = jnp.arange(i_pad, dtype=jnp.int32)
    t = jnp.searchsorted(new_start, slot, side="right").astype(jnp.int32) - 1
    t = jnp.clip(t, 0, num_tiles - 1)
    local = slot - new_start[t]
    valid = (local < count[t]) & (local < padded_counts[t])
    src = jnp.clip(start[t] + local, 0, i_cap - 1)

    return TileAssignment(
        gaussian_idx=jnp.where(valid, assignment.gaussian_idx[src], 0),
        tile_id=jnp.where(valid, assignment.tile_id[src], num_tiles),
        tile_start=new_start,
        tile_count=count,
        n_instances=assignment.n_instances,
        instance_valid=valid & assignment.instance_valid[src],
    )


def gather_instance_features(
    proj: ProjectedSplats, assignment: TileAssignment
) -> tuple[jax.Array, jax.Array]:
    """Gather per-instance blend features in sorted order.

    Returns (geom [I, 8], color [I, 3]):
      geom = (mean_x, mean_y, conic_a, conic_b, conic_c, opacity, 0, 0)
    padded to 8 lanes for clean VMEM tiling. The gather is differentiable —
    its transpose is the scatter-add that replaces the reference backward's
    atomics (kernels_backward.cuh) with an XLA segment-sum. Every feature is
    select-masked by validity so uninitialized cotangents at slack slots can
    never reach the gaussian gradients (select, not multiply: NaN-safe).
    """
    g = assignment.gaussian_idx
    valid = assignment.instance_valid
    v1 = valid[:, None]
    mean2d = jnp.where(v1, proj.mean2d[g], 0.0)
    conic = jnp.where(v1, proj.conic[g], 0.0)
    opac = jnp.where(valid, proj.opacity[g], 0.0)
    zeros = jnp.zeros_like(opac)
    geom = jnp.stack(
        [mean2d[:, 0], mean2d[:, 1], conic[:, 0], conic[:, 1], conic[:, 2], opac, zeros, zeros],
        axis=-1,
    )
    color = jnp.where(v1, proj.color[g], 0.0)
    return geom, color
