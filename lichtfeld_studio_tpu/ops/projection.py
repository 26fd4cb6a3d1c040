"""EWA perspective projection + screen-bounds preprocess.

Re-derivation of the fastgs preprocess kernel
(fastgs/rasterization/include/kernels_forward.cuh:18-205) as fully vectorized
JAX over the static gaussian capacity: sigmoid(opacity) culling, cov3d from
quat/scale, frustum-clamped EWA Jacobian, conic with +0.3 pixel dilation,
SH->RGB, and conservative tile bounds. All culling is expressed as a `valid`
mask instead of warp compaction — XLA fuses the whole thing into one
elementwise pass over [C] gaussians, which is bandwidth-trivial next to the
blend, so no Pallas kernel is needed here.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat
from lichtfeld_studio_tpu.ops.sh import sh_to_color

# Rendering constants (reference rasterization_config.h:12-30)
DILATION = 0.3
MIN_ALPHA_THRESHOLD_RCP = 255.0
MIN_ALPHA_THRESHOLD = 1.0 / MIN_ALPHA_THRESHOLD_RCP
MAX_FRAGMENT_ALPHA = 0.999
TRANSMITTANCE_THRESHOLD = 1e-4
NEAR_PLANE = 0.01
FAR_PLANE = 1e10


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["depth", "mean2d", "conic", "opacity", "color", "bbox", "n_touched", "valid", "tile_mask"],
    meta_fields=[],
)
@dataclass
class ProjectedSplats:
    depth: jax.Array  # [C]
    mean2d: jax.Array  # [C, 2] pixel coords
    conic: jax.Array  # [C, 3] (a, b, c): quadratic form a*dx^2 + 2b*dx*dy + c*dy^2
    opacity: jax.Array  # [C] activated (sigmoid)
    color: jax.Array  # [C, 3] SH-evaluated RGB (unclamped)
    bbox: jax.Array  # [C, 4] int32 tile bounds (x_min, x_max, y_min, y_max), max exclusive
    n_touched: jax.Array  # [C] int32 exact touched-tile count (0 for culled)
    valid: jax.Array  # [C] bool
    # Bitmask over the first EXACT_TILE_CAP bbox cells (row-major): bit k set
    # iff the gaussian contributes to that tile. 0 means "no exact mask" —
    # either culled or bbox larger than the cap (conservative full-bbox).
    tile_mask: jax.Array  # [C] int32


EXACT_TILE_CAP = 32


def _will_contribute(mx, my, ca, cb, cc, tile_x, tile_y, power_threshold,
                     tile_size, rect_pad: float = 0.0):
    """Vectorized port of the exact tile-overlap test
    (fastgs kernel_utils.cuh:108-143, StopThePop-derived): max of the
    gaussian's power over the tile rect vs the alpha-threshold power.
    All args broadcast to [K, C] — K (bbox cells) on the SUBLANE axis and
    gaussians on the 128-lane axis; the transposed [C, K] orientation pads
    K up to 128 lanes (8x wasted lanes at K=16, measured ~2 ms/step).
    rect_pad > 0 grows the tile rect by that many pixels on every side —
    "would the gaussian contribute if its mean drifted up to rect_pad
    pixels?" — used by the frame-coherent renderer's dilated binning
    (render/coherent.py)."""
    rect_min_x = (tile_x * tile_size).astype(jnp.float32) - rect_pad
    rect_min_y = (tile_y * tile_size).astype(jnp.float32) - rect_pad
    rect_max_x = rect_min_x + (tile_size - 1) + 2.0 * rect_pad
    rect_max_y = rect_min_y + (tile_size - 1) + 2.0 * rect_pad

    x_min_diff = rect_min_x - mx
    x_left = (x_min_diff > 0).astype(jnp.float32)
    not_in_x = x_left + (mx > rect_max_x).astype(jnp.float32)
    y_min_diff = rect_min_y - my
    y_above = (y_min_diff > 0).astype(jnp.float32)
    not_in_y = y_above + (my > rect_max_y).astype(jnp.float32)

    inside = (not_in_x + not_in_y) == 0.0

    closest_x = rect_max_x + x_left * (rect_min_x - rect_max_x)
    closest_y = rect_max_y + y_above * (rect_min_y - rect_max_y)
    diff_x = mx - closest_x
    diff_y = my - closest_y
    span = float(tile_size - 1) + 2.0 * rect_pad  # padded rect edge length
    d_x = jnp.where(x_min_diff > 0, span, -span)
    d_y = jnp.where(y_min_diff > 0, span, -span)
    t_x = not_in_y * jnp.clip((d_x * ca * diff_x + d_x * cb * diff_y) / (d_x * ca * d_x), 0.0, 1.0)
    t_y = not_in_x * jnp.clip((d_y * cb * diff_x + d_y * cc * diff_y) / (d_y * cc * d_y), 0.0, 1.0)
    pt_x = closest_x + t_x * d_x
    pt_y = closest_y + t_y * d_y
    dx = mx - pt_x
    dy = my - pt_y
    max_power = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    return inside | (max_power <= power_threshold)


def project_gaussians(
    means: jax.Array,  # [C, 3]
    log_scales: jax.Array,  # [C, 3]
    quats: jax.Array,  # [C, 4] wxyz unnormalized
    logit_opacities: jax.Array,  # [C] or [C, 1]
    sh0: jax.Array,  # [C, 1, 3]
    shN: jax.Array,  # [C, K-1, 3]
    active_mask: jax.Array,  # [C] bool (live slots)
    active_sh_degree: jax.Array,  # [] int32
    w2c: jax.Array,  # [4, 4]
    cam_position: jax.Array,  # [3]
    K: jax.Array,  # [4] (fx, fy, cx, cy)
    *,
    width: int,
    height: int,
    tile_size: int = 16,
    near: float = NEAR_PLANE,
    far: float = FAR_PLANE,
    antialiasing: bool = False,
    exact_tile_cap: int = EXACT_TILE_CAP,
    dilate_px: float = 0.0,
) -> ProjectedSplats:
    """dilate_px > 0 produces CONSERVATIVELY DILATED tile bounds: every tile
    the gaussian could touch if its projected mean drifted up to dilate_px
    pixels is binned (extents + dilate_px, exact test on a dilate_px-padded
    tile rect). Used by the frame-coherent renderer to reuse one binning
    across several nearby cameras (render/coherent.py); 0 is the exact
    reference behavior (kernels_forward.cuh:160-177)."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    grid_w = -(-width // tile_size)
    grid_h = -(-height // tile_size)

    if logit_opacities.ndim == 2:
        logit_opacities = logit_opacities[:, 0]

    # --- camera transform & z cull (kernels_forward.cuh:58-66) ---
    # Explicit component sums: full f32 on the VPU (JAX's default matmul
    # precision would run these tiny contractions at bf16-level accuracy).
    rot_w2c = w2c[:3, :3]
    t_w2c = w2c[:3, 3]
    p_cam = (
        means[:, 0:1] * rot_w2c[:, 0][None, :]
        + means[:, 1:2] * rot_w2c[:, 1][None, :]
        + means[:, 2:3] * rot_w2c[:, 2][None, :]
        + t_w2c[None, :]
    )  # [C, 3]
    depth = p_cam[:, 2]
    valid = active_mask & (depth >= near) & (depth <= far)

    # --- opacity activation & cull ---
    opacity = jax.nn.sigmoid(logit_opacities)
    valid &= opacity >= MIN_ALPHA_THRESHOLD

    # --- cov3d factors (kernels_forward.cuh:76-105) ---
    # cov3d = R diag(var) R^T is never materialized: the 2D covariance below
    # contracts it against the Jacobian rows, which reduces to elementwise
    # sums (batched 3x3 einsums map terribly onto the 128x128 MXU).
    q_norm_sq = jnp.sum(quats * quats, axis=-1)
    valid &= q_norm_sq >= 1e-8
    rot = quat_to_rotmat(quats)  # [C, 3, 3]
    var = jnp.exp(2.0 * log_scales)  # sigma^2

    # --- normalized image-plane coords, clamped to a 15%-expanded frustum ---
    safe_depth = jnp.where(jnp.abs(depth) > 1e-12, depth, 1e-12)
    x = p_cam[:, 0] / safe_depth
    y = p_cam[:, 1] / safe_depth
    clip_left = (-0.15 * width - cx) / fx
    clip_right = (1.15 * width - cx) / fx
    clip_top = (-0.15 * height - cy) / fy
    clip_bottom = (1.15 * height - cy) / fy
    tx = jnp.clip(x, clip_left, clip_right)
    ty = jnp.clip(y, clip_top, clip_bottom)

    # --- EWA: cov2d = (J W) cov3d (J W)^T with J the projective Jacobian ---
    j11 = fx / safe_depth
    j13 = -j11 * tx
    j22 = fy / safe_depth
    j23 = -j22 * ty
    w1, w2, w3 = rot_w2c[0], rot_w2c[1], rot_w2c[2]  # rows, [3]
    jw1 = j11[:, None] * w1[None, :] + j13[:, None] * w3[None, :]  # [C, 3]
    jw2 = j22[:, None] * w2[None, :] + j23[:, None] * w3[None, :]
    # With a = JW (rows jw1/jw2):  a cov3d a^T = sum_k var_k (a R)_k^2 —
    # u = a @ R are two [C,3] vectors, everything stays elementwise/VPU.
    u1 = jnp.sum(jw1[:, :, None] * rot, axis=1)  # [C, 3]
    u2 = jnp.sum(jw2[:, :, None] * rot, axis=1)
    c_xx = jnp.sum(var * u1 * u1, axis=-1) + DILATION
    c_xy = jnp.sum(var * u1 * u2, axis=-1)
    c_yy = jnp.sum(var * u2 * u2, axis=-1) + DILATION

    det = c_xx * c_yy - c_xy * c_xy
    valid &= det >= 1e-8
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    conic = jnp.stack([c_yy / safe_det, -c_xy / safe_det, c_xx / safe_det], axis=-1)

    if antialiasing:
        # Mip-Splatting compensation (reference rasterizer.cpp:52,181
        # calc_compensations): scale opacity by sqrt(det(cov2d)/det(cov2d+dilation))
        det_raw = (c_xx - DILATION) * (c_yy - DILATION) - c_xy * c_xy
        comp = jnp.sqrt(jnp.maximum(det_raw, 0.0) / safe_det)
        opacity = opacity * comp
        valid &= opacity >= MIN_ALPHA_THRESHOLD

    mean2d = jnp.stack([x * fx + cx, y * fy + cy], axis=-1)

    # --- conservative tile bounds (kernels_forward.cuh:160-177) ---
    power_threshold = jnp.log(jnp.maximum(opacity, MIN_ALPHA_THRESHOLD) * MIN_ALPHA_THRESHOLD_RCP)
    ptf = jnp.sqrt(jnp.maximum(2.0 * power_threshold, 0.0))
    extent_x = jnp.maximum(ptf * jnp.sqrt(jnp.maximum(c_xx, 0.0)) - 0.5, 0.0) + dilate_px
    extent_y = jnp.maximum(ptf * jnp.sqrt(jnp.maximum(c_yy, 0.0)) - 0.5, 0.0) + dilate_px
    ts = float(tile_size)
    x_min = jnp.clip(jnp.floor((mean2d[:, 0] - extent_x) / ts).astype(jnp.int32), 0, grid_w)
    x_max = jnp.clip(jnp.ceil((mean2d[:, 0] + extent_x) / ts).astype(jnp.int32), 0, grid_w)
    y_min = jnp.clip(jnp.floor((mean2d[:, 1] - extent_y) / ts).astype(jnp.int32), 0, grid_h)
    y_max = jnp.clip(jnp.ceil((mean2d[:, 1] + extent_y) / ts).astype(jnp.int32), 0, grid_h)
    bb_w = x_max - x_min
    area = bb_w * (y_max - y_min)
    valid &= area > 0
    bbox = jnp.stack([x_min, x_max, y_min, y_max], axis=-1)

    # --- exact touched-tile count over the first `exact_tile_cap` bbox cells
    # (replaces compute_exact_n_touched_tiles, kernel_utils.cuh:146-196:
    # the CUDA warp-cooperative loop becomes a [C, K] vectorized test).
    # K is tile-size-adaptive at the call site: at 32px tiles nearly every
    # bbox fits in a few cells (measured 2.9% instance inflation with the
    # test fully disabled), so a small K keeps the pruning while shrinking
    # this [C, K] pass and its reduction — the trace showed 4 ms in the
    # K=32 reduction alone at 1M capacity ---
    if exact_tile_cap <= 0:
        # feature-only projection (frame-coherent renderer's per-frame pass:
        # binning is reused, so the [K, C] test would be dead weight)
        n_touched = area
        tile_mask = jnp.zeros_like(area)
    else:
        k = jnp.arange(exact_tile_cap, dtype=jnp.int32)[:, None]  # [K, 1]
        safe_w = jnp.maximum(bb_w, 1)[None, :]
        cand_x = x_min[None, :] + k % safe_w  # [K, C]
        cand_y = y_min[None, :] + k // safe_w
        in_bbox = k < area[None, :]
        contrib = _will_contribute(
            (mean2d[:, 0] - 0.5)[None, :],
            (mean2d[:, 1] - 0.5)[None, :],
            conic[:, 0][None, :],
            conic[:, 1][None, :],
            conic[:, 2][None, :],
            cand_x,
            cand_y,
            power_threshold[None, :],
            tile_size,
            rect_pad=dilate_px,
        )
        use_exact = (area <= exact_tile_cap) & valid
        # distinct powers of two: summation == bitwise OR (incl. the sign
        # bit). ONE [K, C] reduction over the (cheap) sublane axis; the
        # exact count is recovered from the mask with popcount.
        bits = jnp.where(in_bbox & contrib, jnp.int32(1) << k, 0)
        mask_all = jnp.sum(bits, axis=0)
        tile_mask = jnp.where(use_exact, mask_all, 0)
        n_exact = jax.lax.population_count(mask_all)
        n_touched = jnp.where(use_exact, n_exact, area)
    valid &= n_touched > 0
    n_touched = jnp.where(valid, n_touched, 0)
    tile_mask = jnp.where(valid, tile_mask, 0)

    # --- SH -> RGB ---
    color = sh_to_color(sh0, shN, means, cam_position, active_sh_degree)

    return ProjectedSplats(
        depth=depth,
        mean2d=mean2d,
        conic=conic,
        opacity=opacity,
        color=color,
        bbox=bbox,
        n_touched=n_touched,
        valid=valid,
        tile_mask=tile_mask,
    )
