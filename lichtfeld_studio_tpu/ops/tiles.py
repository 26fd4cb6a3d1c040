"""Tile binning: instance expansion, composite-key sort, tile ranges.

TPU re-derivation of the fastgs binning pipeline
(fastgs/rasterization/src/forward.cu:15-199: preprocess counters -> cub
radix sort by depth -> exclusive scan -> create_instances -> radix sort by
tile key -> range extraction). The CUDA version relies on atomics, device
compaction, and two radix sorts with D2H counter readbacks (sync points at
forward.cu:99-101,175).

Here the same dataflow is expressed with static shapes and zero host syncs,
built only from TPU-fast primitives (profiled on v5e):

1. `n_touched` per gaussian -> exclusive cumsum -> each gaussian's segment in
   a fixed-capacity instance buffer.
2. Instance slot -> owning gaussian via **scatter-markers + prefix sum**
   (ones scattered at segment starts, cumsum-1 gives the owner). This
   replaces a vectorized binary search: jnp.searchsorted costs ~600 ms at 4M
   instances on v5e while scatter+cumsum is ~50 ms.
3. All per-gaussian lookups ride ONE bit-packed [N, 4]-int32 row gather
   (bbox, n_touched, depth bits, exact-contribution mask) — row gathers
   amortize far better than repeated scalar gathers, and gather cost scales
   with row bytes.
4. ONE lexicographic two-key sort (tile_id, depth_bits) — both int32 —
   replaces the reference's dual radix sort: positive-float depth bits are
   monotonic as int32, so the single pass depth-orders instances within each
   tile. Invalid slots get tile_id = num_tiles and sort to the end.
5. Per-tile counts via segment_sum; CHUNK-aligned padded layout (required by
   the Pallas blend's gradient writeback) built by *scattering* sorted
   instances to their padded positions — no second binary search.

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
    data_fields=["gaussian_idx", "slot_layout", "tile_start", "tile_count", "n_instances", "instance_valid", "slot_gaussian"],
    meta_fields=["chunk", "source_cap"],
)
@dataclass
class TileAssignment:
    gaussian_idx: jax.Array  # [I] int32 — owning gaussian per laid-out instance
    slot_layout: jax.Array  # [I] int32 — pre-sort expansion slot per layout
    #   position (source_cap sentinel for slack/filler positions). Every real
    #   slot in [0, source_cap) appears exactly once, so the gradient path can
    #   recover pre-sort (per-gaussian-contiguous) order by ONE value-sort of
    #   the kernel's per-instance gradient rows keyed on this array — no
    #   random gather, no scatter.
    tile_start: jax.Array  # [T] int32 — first instance index per tile
    tile_count: jax.Array  # [T] int32 — real instances per tile
    n_instances: jax.Array  # [] int32 — true instance total (may exceed I)
    instance_valid: jax.Array  # [I] bool
    slot_gaussian: jax.Array | None = None  # [I] int32 — owning gaussian per
    #   PRE-SORT expansion slot (the expand kernel's g output). Consumed by
    #   the gradient segment-reduce's equality membership; DCE'd by XLA on
    #   forward-only paths.
    chunk: int = 1  # alignment of tile_start (1 = compact layout)
    source_cap: int = 0  # pre-sort expansion buffer size (= instance_cap)


def _depth_key_bits(depth: jax.Array) -> jax.Array:
    """Monotonic int32 ordering key for positive float32 depths
    (the reference reinterprets the float bits the same way,
    kernels_forward.cuh:199)."""
    return jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)


def _select_bit(mask: jax.Array, r: jax.Array) -> jax.Array:
    """Index of the r-th set bit of each int32 mask (binary search over
    popcounts, 5 vector passes) — maps an instance's rank to its bbox cell
    under the exact-contribution bitmask."""
    k = jnp.zeros_like(r)
    remaining = r
    for w in (16, 8, 4, 2, 1):
        width_mask = jnp.int32((1 << w) - 1)
        window = (mask >> k) & width_mask
        cnt = jax.lax.population_count(window)
        go_right = remaining >= cnt
        remaining = jnp.where(go_right, remaining - cnt, remaining)
        k = jnp.where(go_right, k + w, k)
    return k


def build_tile_assignment(
    proj: ProjectedSplats,
    *,
    grid_w: int,
    grid_h: int,
    instance_cap: int,
    chunk_align: int = 1,
    need_grad: bool = True,
) -> TileAssignment:
    """Bin projected gaussians into per-tile depth-sorted instance lists.

    chunk_align > 1 produces the CHUNK-aligned layout the Pallas blend needs
    (each tile's range starts at a multiple of chunk_align; slack slots are
    invalid). The layout capacity is instance_cap (+ per-tile slack).

    need_grad=False is the inference path (viewer / headless render, the
    equivalent of the reference's forward-only K25 rasterizer,
    src/rendering/cuda/): it (a) skips the inverse-permutation sort that
    only the gradient reduction consumes, and (b) fuses (tile, depth) into a
    ONE-word sort key — tile id in the high bits, the top bits of the
    positive-float depth pattern below — turning the two-key lexicographic
    sort into a single-key sort. Depth keeps 31 - ceil(log2(tiles)) bits
    (18 at 1080p), so only gaussians within ~2^-10 relative depth of each
    other may swap blend order; falls back to the exact two-key sort when
    fewer than 12 depth bits would remain. Training keeps the EXACT two-key
    sort: the reference's 64-bit key carries the full 32 depth bits
    (IntersectTile.cu:95-106), and the golden-data invariants assert strict
    within-tile depth order — measured win of fusing was ~1 ms/step, not
    worth the parity deviation."""
    n_touched = proj.n_touched  # [C] int32, 0 for culled
    num_tiles = grid_w * grid_h
    tile_bits = int(num_tiles).bit_length()  # holds 0..num_tiles (sentinel)
    depth_keep = 31 - tile_bits
    fused_key = (not need_grad) and depth_keep >= 12

    # --- packed per-gaussian int payload; bit-packed to 4 words:
    #   w0 = x_min | y_min << 16
    #   w1 = bbox_width | n_touched << 10   (grids <= 1024 tiles wide)
    #   w2 = depth key bits, w3 = exact-contribution tile mask ---
    bbox = proj.bbox  # [C, 4] (x_min, x_max, y_min, y_max)
    bb_w = jnp.maximum(bbox[:, 1] - bbox[:, 0], 1)
    # feature-major [4, C]: a [C,4] int32 array tiles as T(*,128) and pads
    # its minor dim 4 -> 128 lanes (32x HBM blowup); [4, C] keeps gaussians
    # on the lane axis so the gather reads/writes only real data
    payload_t = jnp.stack(
        [
            bbox[:, 0] | (bbox[:, 2] << 16),
            bb_w | (n_touched << 10),
            _depth_key_bits(proj.depth),
            proj.tile_mask,
        ],
        axis=0,
    )  # [4, C] int32

    slot = jnp.arange(instance_cap, dtype=jnp.int32)
    total = jnp.sum(n_touched).astype(jnp.int32)
    if jax.default_backend() in ("tpu", "axon"):
        # Pallas expansion: compaction sort + windowed one-hot matmul
        # (kernels/expand_pallas.py) — replaces ~15 ms of scatter-marker +
        # prefix scans + payload gather with ~6 ms at the bench geometry
        from lichtfeld_studio_tpu.kernels.expand_pallas import expand_instances

        g, rank, pl_t = expand_instances(
            n_touched, payload_t, instance_cap, counts_bits=10
        )
    else:
        # --- XLA construction: instance slot -> owning gaussian (scatter-
        # marker + cumsum), and slot -> rank-within-segment WITHOUT the
        # offsets[g] gather (a [I] gather from a [C] table costs ~19 ms at
        # 2.5M on v5e; a second scatter+cumsum is ~3 ms): scatter each
        # segment's start-position JUMP at its start and prefix-sum — the
        # running sum IS the owning segment's start offset ---
        offsets = (jnp.cumsum(n_touched) - n_touched).astype(jnp.int32)
        marker = (
            jnp.zeros((instance_cap,), jnp.int32).at[offsets].add(1, mode="drop")
        )
        g = jnp.cumsum(marker) - 1
        # segment start via running max of marked positions (no 2nd scatter)
        seg_start = jax.lax.cummax(jnp.where(marker > 0, slot, 0))
        rank = slot - seg_start
        pl_t = jnp.take(payload_t, g, axis=1)  # [4, I]
    x_min_i = pl_t[0] & 0xFFFF
    y_min_i = (pl_t[0] >> 16) & 0xFFFF
    bb_w_i = pl_t[1] & 0x3FF
    nt_i = pl_t[1] >> 10
    inst_valid = (slot < total) & (rank < nt_i)

    # rank -> bbox cell: the rank-th *contributing* cell when the exact
    # tile_mask is present (mask == 0 means conservative full bbox)
    mask = pl_t[3]
    cell = jnp.where(mask != 0, _select_bit(mask, rank), rank)
    t_x = x_min_i + cell % bb_w_i
    t_y = y_min_i + cell // bb_w_i
    tile = t_y * grid_w + t_x
    tile = jnp.clip(tile, 0, num_tiles - 1)
    tile = jnp.where(inst_valid, tile, num_tiles)  # invalid -> end of sort

    # --- lexicographic (tile, depth) sort. The owning-gaussian id rides
    # along as a sort value (cheaper than re-gathering it post-sort: gathers
    # with random indices cost ~14 ns/elem on TPU, sort operands ~1).
    # need_grad additionally carries the pre-sort slot for the gradient
    # path's permutation inverse (see gather_instance_features) ---
    # is_stable=False on every sort: keys are unique (or ties are
    # semantically interchangeable), and stability costs an extra iota
    # tiebreaker operand per sort on TPU
    if fused_key:
        key = (tile << depth_keep) | jax.lax.shift_right_logical(
            pl_t[2], 31 - depth_keep
        )
        # need_grad=False: the pre-sort slot ids exist only for the gradient
        # path's restore sort — don't carry them through the sort (sort cost
        # is per OPERAND; XLA cannot narrow a variadic sort by DCE)
        key_sorted, g_sorted = jax.lax.sort(
            (key, g), dimension=0, num_keys=1, is_stable=False
        )
        slot_sorted = jnp.zeros_like(slot)
        tile_sorted = key_sorted >> depth_keep
    else:
        tile_sorted, _, slot_sorted, g_sorted = jax.lax.sort(
            (tile, pl_t[2], slot, g), dimension=0, num_keys=2, is_stable=False
        )
    valid_sorted = tile_sorted < num_tiles
    g_sorted = jnp.where(valid_sorted, g_sorted, 0)

    # --- per-tile compact starts/counts. The instance buffer is sorted by
    # tile, so a binary search with num_tiles+1 queries (tiny) replaces a
    # multi-million-update segment_sum (~23 ms -> ~2 ms at a 2.5M cap). The
    # inference path keeps the (pre-sort) MXU one-hot histogram ---
    starts_q = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)  # [T+1]; starts_q[T] == n_valid instances
    counts = starts_q[1:] - starts_q[:-1]
    start_compact = starts_q[:num_tiles]
    n_valid = starts_q[num_tiles]

    if chunk_align <= 1:
        return TileAssignment(
            gaussian_idx=g_sorted,
            slot_layout=slot_sorted,
            tile_start=start_compact,
            tile_count=counts,
            n_instances=total,
            instance_valid=valid_sorted,
            slot_gaussian=g,
            chunk=1,
            source_cap=instance_cap,
        )

    # --- CHUNK-aligned relayout as ONE value-sort (TPU scatters are ~10x
    # slower than sorts, PERFNOTES). Each real instance gets its padded
    # position arithmetically; per-tile slack positions are claimed by
    # synthetic FILLER elements; overflow-dropped instances park in the
    # region past sum(padded_counts) (never read by the kernel, but their
    # slots must stay present for the gradient path's slot-sort). Together
    # the positions form an EXACT permutation of [0, i_pad), so sorting
    # (position, gaussian+1, slot) yields the dense padded layout directly —
    # sort rank == position ---
    padded_counts = -(-counts // chunk_align) * chunk_align
    new_start = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)
    sum_padded = new_start[num_tiles - 1] + padded_counts[num_tiles - 1]
    n_fill = num_tiles * (chunk_align - 1)
    i_pad = instance_cap + n_fill

    # Sorted slot j of tile t sits at new_start[t] + (j - start_compact[t])
    # = j + delta[t], where delta[t] = total CHUNK-slack of all earlier
    # tiles. Computed with ZERO gathers/scatters from the sorted tile run
    # structure alone: delta increments at each tile boundary by the slack
    # of the run that just ended, (-L) mod chunk with L the previous run
    # length — run starts tracked by an elementwise boundary test + cummax.
    j = jnp.arange(instance_cap, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), tile_sorted[1:] != tile_sorted[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(boundary, j, 0))  # current run's start
    prev_start = jnp.concatenate([jnp.zeros((1,), jnp.int32), run_start[:-1]])
    prev_len = j - prev_start  # at a boundary: length of the run that ended
    inc = jnp.where(boundary & (j > 0), (-prev_len) % chunk_align, 0)
    delta_run = jnp.cumsum(inc)
    # invalid instances are contiguous at the end after the sort, so their
    # overflow-region rank is just j - n_valid
    pos_real = jnp.where(valid_sorted, j + delta_run, sum_padded + (j - n_valid))

    # Filler elements claim each tile's slack positions — built arithmetically
    # on a [T, chunk-1] grid (zero gathers); excess fillers take the tail
    # positions after the overflow-parked invalid instances.
    a = chunk_align - 1
    k = jnp.arange(a, dtype=jnp.int32)[None, :]  # [1, A]
    slack = (padded_counts - counts)[:, None]  # [T, 1], in [0, chunk)
    fvalid = k < slack
    inv_per_tile = a - slack[:, 0]
    inv_start = (jnp.cumsum(inv_per_tile) - inv_per_tile)[:, None]
    n_inv_real = instance_cap - n_valid
    pos_fill = jnp.where(
        fvalid,
        (new_start + counts)[:, None] + k,
        sum_padded + n_inv_real + inv_start + (k - slack),
    ).reshape(-1)

    pos_all = jnp.concatenate([pos_real, pos_fill])
    gval = jnp.concatenate(
        [jnp.where(valid_sorted, g_sorted + 1, 0), jnp.zeros((n_fill,), jnp.int32)]
    )
    slotval = jnp.concatenate(
        [slot_sorted, jnp.full((n_fill,), instance_cap, jnp.int32)]
    )
    _, gv, slot_layout = jax.lax.sort(
        (pos_all, gval, slotval), dimension=0, num_keys=1, is_stable=False
    )
    return TileAssignment(
        gaussian_idx=jnp.maximum(gv - 1, 0),
        slot_layout=slot_layout,
        tile_start=new_start,
        tile_count=counts,
        n_instances=total,
        instance_valid=gv > 0,
        slot_gaussian=g,
        chunk=chunk_align,
        source_cap=instance_cap,
    )


def pack_features(proj: ProjectedSplats, with_depth: bool = False) -> jax.Array:
    """Per-gaussian packed blend features [C, 16] f32 (one row per gaussian,
    gathered once per instance — row layout matches the Pallas kernel:
    0 mean_x, 1 mean_y, 2-4 conic, 5 opacity, 8-10 rgb, 11 depth)."""
    c = proj.mean2d.shape[0]
    zeros = jnp.zeros((c,), proj.depth.dtype)
    depth_ch = proj.depth if with_depth else zeros
    return jnp.stack(
        [
            proj.mean2d[:, 0],
            proj.mean2d[:, 1],
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            proj.opacity,
            zeros,
            zeros,
            proj.color[:, 0],
            proj.color[:, 1],
            proj.color[:, 2],
            depth_ch,
            zeros,
            zeros,
            zeros,
            zeros,
        ],
        axis=-1,
    )


def pack_features_t(proj: ProjectedSplats, with_depth: bool = False) -> jax.Array:
    """Feature-major packed per-gaussian blend features [16, C] f32.

    Same row meaning as pack_features (0 mean_x, 1 mean_y, 2-4 conic,
    5 opacity, 8-10 rgb, 11 depth) but with gaussians on the LANE axis:
    a [C, 16] array tiles as T(8,128) on TPU and pads its 16-wide minor dim
    to 128 lanes — an 8x HBM blowup on every materialization. [16, C] keeps
    lanes fully utilized; this is the production (pallas) layout."""
    c = proj.mean2d.shape[0]
    zeros = jnp.zeros((c,), proj.depth.dtype)
    depth_ch = proj.depth if with_depth else zeros
    return jnp.stack(
        [
            proj.mean2d[:, 0],
            proj.mean2d[:, 1],
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            proj.opacity,
            zeros,
            zeros,
            proj.color[:, 0],
            proj.color[:, 1],
            proj.color[:, 2],
            depth_ch,
            zeros,
            zeros,
            zeros,
            zeros,
        ],
        axis=0,
    )


def sort_rows_to_slot_order(
    columns: list[jax.Array],  # each [I_layout]
    slot_layout: jax.Array,  # [I_layout]
    valid: jax.Array,  # [I_layout] bool
    source_cap: int,
    slice_to_cap: bool = True,
) -> list[jax.Array]:
    """Per-instance gradient columns (layout order) -> pre-sort slot order.

    The reference backward accumulates per-gaussian gradients with warp
    atomics (kernels_backward.cuh); XLA's generic transpose would be a random
    scatter-add (~600 ms at 4M instances on v5e — TPU scatters run ~10x
    slower than sorts). Instead: every slot in [0, source_cap) appears
    exactly once in slot_layout (slack/filler positions carry the sentinel
    source_cap), so ONE value-sort keyed on slot_layout puts the rows in
    pre-sort order at positions [0, source_cap) — where each gaussian's
    instances are contiguous and reduce with prefix sums. Rows are
    select-zeroed by validity BEFORE the sort (NaN-safe: slack rows are
    uninitialized kernel output)."""
    cols = [jnp.where(valid, c, jnp.zeros((), c.dtype)) for c in columns]
    sorted_all = jax.lax.sort(
        (slot_layout, *cols), dimension=0, num_keys=1, is_stable=False
    )
    if not slice_to_cap:
        # rows beyond source_cap are slack/filler (sentinel-keyed, sorted to
        # the end) — callers that never read past source_cap can skip the
        # 8 slice copies (the segment-reduce kernel bounds reads by off<=cap)
        return list(sorted_all[1:])
    return [c[:source_cap] for c in sorted_all[1:]]


def segment_sum_by_prefix(d_pre: jax.Array, n_touched: jax.Array, source_cap: int) -> jax.Array:
    """Per-gaussian segment sums of slot-ordered rows as prefix differences
    at the expansion offsets. Expansion segments are contiguous
    (end[n] == off[n+1]), so ONE gather of the prefix array at the extended
    offsets serves both ends of every difference. f32 precision note:
    gradient prefix sums are signed random walks, so |S| stays ~sqrt(I)-scale
    and the difference error is O(eps * |S|) — far below gradient noise."""
    f = d_pre.shape[-1]
    s = jnp.cumsum(d_pre, axis=0)
    s0 = jnp.concatenate([jnp.zeros((1, f), d_pre.dtype), s], axis=0)
    ends = jnp.cumsum(n_touched)  # inclusive: off[n+1]
    off_ext = jnp.minimum(
        jnp.concatenate([jnp.zeros((1,), ends.dtype), ends]), source_cap
    )  # [N+1]
    q = s0[off_ext]  # [N+1, F]
    return q[1:] - q[:-1]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_feat(source_cap, packed, g_pad, slot_layout, valid, n_touched):
    feat = packed[g_pad]
    return jnp.where(valid[:, None], feat, 0.0)


def _gather_feat_fwd(source_cap, packed, g_pad, slot_layout, valid, n_touched):
    out = _gather_feat(source_cap, packed, g_pad, slot_layout, valid, n_touched)
    return out, (slot_layout, valid, n_touched)


def _gather_feat_bwd(source_cap, res, dfeat):
    from lichtfeld_studio_tpu.kernels.segment_reduce import segment_reduce_cols

    slot_layout, valid, n_touched = res
    f = dfeat.shape[-1]
    cols = sort_rows_to_slot_order(
        [dfeat[:, k] for k in range(f)], slot_layout, valid, source_cap,
        slice_to_cap=False,
    )
    dpacked = segment_reduce_cols(cols, n_touched, source_cap)
    return (dpacked, None, None, None, None)


_gather_feat.defvjp(_gather_feat_fwd, _gather_feat_bwd)


def gather_instance_features(
    packed: jax.Array, assignment: TileAssignment, n_touched: jax.Array
) -> jax.Array:
    """One differentiable row gather [I, 16] of the packed per-gaussian
    features into instance layout, with a custom VJP that turns the gradient
    scatter-add into a slot-keyed value sort + segmented prefix sums
    (see sort_rows_to_slot_order). Rows are select-masked by validity so
    uninitialized cotangents at slack slots can never reach the gaussian
    gradients."""
    return _gather_feat(
        assignment.source_cap,
        packed,
        assignment.gaussian_idx,
        assignment.slot_layout,
        assignment.instance_valid,
        n_touched,
    )
