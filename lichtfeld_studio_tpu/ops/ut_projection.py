"""3DGUT unscented-transform projection for nonlinear camera models.

Reference: gsplat/ProjectionUT3DGSFused.cu:16-289 + Cameras.cuh (sigma
points :1034-1086, UT transform :1093-1165, camera models: PerfectPinhole /
OpenCVPinhole :600-700 / OpenCVFisheye / Orthographic). Used by the `--gut`
path and whenever cameras carry distortion.

TPU-first shape: the CUDA kernel loops 7 sigma points per thread; here the
whole thing is a [C, 7] batched evaluation fused by XLA — projection of all
sigma points of all gaussians at once. Sigma-point scheme (Wan & van der
Merwe 2000 defaults alpha=0.1 beta=2 kappa=0):

  lambda = alpha^2 (D + kappa) - D,  D = 3
  points: mean, mean +- sqrt(D+lambda) * s_i * R[:, i]
  w_mean = [lambda/(D+lambda), 1/(2(D+lambda)) x 6]
  w_cov  = w_mean + [1 - alpha^2 + beta at index 0]

The image covariance gets the +eps2d dilation like the EWA path; conic,
bounds and culling feed the same ProjectedSplats structure so the tile
binning and blend are shared with the fast path.

Rolling shutter (reference Cameras.cuh:253-413 + ProjectionUT3DGSFused.cu
viewmats0/viewmats1): each sigma point is projected through a per-point
pose interpolated at its own scanline time — the fixed-point iteration
image point -> relative frame time -> slerp(start, end) pose -> reproject,
unrolled N_ROLLING_SHUTTER_ITERATIONS=10 times (Cameras.cuh:346), here as a
[C, 7]-batched unrolled loop. The gaussian's depth cull uses the mid-frame
(t=0.5) pose like ProjectionUT3DGSFused.cu:76-78.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.core.camera import CameraModelType, ShutterType
from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat
from lichtfeld_studio_tpu.ops.projection import (
    EXACT_TILE_CAP,
    MIN_ALPHA_THRESHOLD,
    MIN_ALPHA_THRESHOLD_RCP,
    NEAR_PLANE,
    FAR_PLANE,
    ProjectedSplats,
    _will_contribute,
)
from lichtfeld_studio_tpu.ops.sh import sh_to_color

UT_ALPHA = 0.1
UT_BETA = 2.0
UT_KAPPA = 0.0
UT_MARGIN = 0.1
EPS2D = 0.3
N_ROLLING_SHUTTER_ITERATIONS = 10  # Cameras.cuh:346


def _rotmat_to_quat(R: jax.Array) -> jax.Array:
    """[3,3] rotation -> [4] wxyz quaternion (branch-free Shepperd)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    # four candidate formulations; pick the numerically largest pivot
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz])
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)


def _quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Slerp q0 [4] -> q1 [4] at t [...]; returns [..., 4] (glm::slerp)."""
    dot = jnp.sum(q0 * q1)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-4
    t = t[..., None]
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def _quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v [..., 3] by q [..., 4] (wxyz)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    u = jnp.stack([x, y, z], axis=-1)
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w[..., None] * uv + uuv)


def _shutter_time(img_pts: jax.Array, shutter_type: int, width: int, height: int) -> jax.Array:
    """Relative frame time of image points [..., 2]
    (Cameras.cuh:294-318 shutter_relative_frame_time)."""
    x = img_pts[..., 0]
    y = img_pts[..., 1]
    if shutter_type == ShutterType.ROLLING_TOP_TO_BOTTOM:
        t = jnp.floor(y) / (height - 1)
    elif shutter_type == ShutterType.ROLLING_LEFT_TO_RIGHT:
        t = jnp.floor(x) / (width - 1)
    elif shutter_type == ShutterType.ROLLING_BOTTOM_TO_TOP:
        t = (height - jnp.ceil(y)) / (height - 1)
    elif shutter_type == ShutterType.ROLLING_RIGHT_TO_LEFT:
        t = (width - jnp.ceil(x)) / (width - 1)
    else:
        t = jnp.zeros_like(x)
    return jnp.clip(t, 0.0, 1.0)


def _sigma_points(means, log_scales, quats):
    """[C,3],[C,3],[C,4] -> points [C,7,3], w_mean [7], w_cov [7]."""
    d = 3.0
    lam = UT_ALPHA**2 * (d + UT_KAPPA) - d
    rot = quat_to_rotmat(quats)  # [C, 3, 3]; columns are the gaussian axes
    scale = jnp.exp(log_scales)
    # delta_i = sqrt(D+lambda) * s_i * R[:, i]  (glm R[i] is column i)
    deltas = jnp.sqrt(d + lam) * scale[:, None, :] * rot  # [C, 3(row), 3(i)]
    deltas = jnp.swapaxes(deltas, 1, 2)  # [C, i, xyz]
    pts = jnp.concatenate(
        [means[:, None, :], means[:, None, :] + deltas, means[:, None, :] - deltas],
        axis=1,
    )  # [C, 7, 3]
    w0 = lam / (d + lam)
    wi = 1.0 / (2.0 * (d + lam))
    w_mean = jnp.asarray([w0] + [wi] * 6, jnp.float32)
    w_cov = w_mean.at[0].add(1.0 - UT_ALPHA**2 + UT_BETA)
    return pts, w_mean, w_cov


def _distort_opencv(x, y, radial, tangential):
    """OpenCV rational radial + tangential distortion of normalized coords
    (Cameras.cuh:640-660). radial [6], tangential [2]."""
    k = jnp.zeros(6).at[: radial.shape[0]].set(radial) if radial.shape[0] else jnp.zeros(6)
    p = jnp.zeros(2).at[: tangential.shape[0]].set(tangential) if tangential.shape[0] else jnp.zeros(2)
    r2 = x * x + y * y
    alpha = 1.0 + r2 * (k[0] + r2 * (k[1] + r2 * k[2]))
    beta = 1.0 + r2 * (k[3] + r2 * (k[4] + r2 * k[5]))
    d = alpha / beta
    xd = x * d + 2.0 * p[0] * x * y + p[1] * (r2 + 2.0 * x * x)
    yd = y * d + p[0] * (r2 + 2.0 * y * y) + 2.0 * p[1] * x * y
    return xd, yd


def _distort_fisheye(x, y, z, radial):
    """Equidistant fisheye with polynomial theta distortion. Returns
    normalized image-plane coords."""
    k = jnp.zeros(4).at[: min(radial.shape[0], 4)].set(radial[:4]) if radial.shape[0] else jnp.zeros(4)
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))
    scale = jnp.where(r > 1e-8, theta_d / jnp.maximum(r, 1e-8), 1.0)
    return x * scale, y * scale


def _project_points(p_cam, K, camera_model, radial, tangential, width, height):
    """Camera-space points [..., 3] -> (image points [..., 2], valid [...])."""
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    z = p_cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    if camera_model == CameraModelType.ORTHO:
        u = p_cam[..., 0] * fx + cx
        v = p_cam[..., 1] * fy + cy
        valid_z = z > 0
    elif camera_model == CameraModelType.OPENCV_FISHEYE:
        xd, yd = _distort_fisheye(p_cam[..., 0], p_cam[..., 1], z, radial)
        u = xd * fx + cx
        v = yd * fy + cy
        valid_z = z > 1e-8  # fisheye can exceed 180deg; conservative
    else:
        x = p_cam[..., 0] / safe_z
        y = p_cam[..., 1] / safe_z
        if camera_model == CameraModelType.OPENCV_PINHOLE:
            x, y = _distort_opencv(x, y, radial, tangential)
        u = x * fx + cx
        v = y * fy + cy
        valid_z = z > 0
    m = UT_MARGIN
    in_img = (
        (u >= -m * width) & (u <= (1 + m) * width)
        & (v >= -m * height) & (v <= (1 + m) * height)
    )
    return jnp.stack([u, v], axis=-1), valid_z & in_img


def project_gaussians_ut(
    means: jax.Array,
    log_scales: jax.Array,
    quats: jax.Array,
    logit_opacities: jax.Array,
    sh0: jax.Array,
    shN: jax.Array,
    active_mask: jax.Array,
    active_sh_degree: jax.Array,
    w2c: jax.Array,
    cam_position: jax.Array,
    K: jax.Array,
    *,
    width: int,
    height: int,
    tile_size: int = 16,
    camera_model: int = CameraModelType.PINHOLE,
    radial: jax.Array | None = None,
    tangential: jax.Array | None = None,
    near: float = NEAR_PLANE,
    far: float = FAR_PLANE,
    eps2d: float = EPS2D,
    antialiasing: bool = False,
    w2c_end: jax.Array | None = None,
    shutter_type: int = ShutterType.GLOBAL,
    exact_tile_test: bool = True,
) -> ProjectedSplats:
    if radial is None:
        radial = jnp.zeros((0,), jnp.float32)
    if tangential is None:
        tangential = jnp.zeros((0,), jnp.float32)
    if logit_opacities.ndim == 2:
        logit_opacities = logit_opacities[:, 0]
    grid_w = -(-width // tile_size)
    grid_h = -(-height // tile_size)
    rolling = shutter_type != ShutterType.GLOBAL and w2c_end is not None

    rot_w2c = w2c[:3, :3]
    t_w2c = w2c[:3, 3]
    if rolling:
        # mid-frame pose for the center depth cull
        # (ProjectionUT3DGSFused.cu:76-78 interpolate_shutter_pose(0.5))
        q0 = _rotmat_to_quat(rot_w2c)
        q1 = _rotmat_to_quat(w2c_end[:3, :3])
        t1 = w2c_end[:3, 3]
        q_mid = _quat_slerp(q0, q1, jnp.asarray(0.5))
        t_mid = 0.5 * (t_w2c + t1)
        mean_c = _quat_rotate(q_mid[None, :], means) + t_mid[None, :]
    else:
        mean_c = (
            means[:, 0:1] * rot_w2c[:, 0][None, :]
            + means[:, 1:2] * rot_w2c[:, 1][None, :]
            + means[:, 2:3] * rot_w2c[:, 2][None, :]
            + t_w2c[None, :]
        )
    depth = mean_c[:, 2]
    valid = active_mask & (depth >= near) & (depth <= far)

    opacity = jax.nn.sigmoid(logit_opacities)
    valid &= opacity >= MIN_ALPHA_THRESHOLD
    valid &= jnp.sum(quats * quats, axis=-1) >= 1e-8

    # sigma points -> camera space -> image points
    pts, w_mean, w_cov = _sigma_points(means, log_scales, quats)  # [C,7,3]
    if rolling:
        # Per-sigma-point shutter-pose fixed point (Cameras.cuh:347-413):
        # start with the start-of-frame projection (fall back to end), then
        # iterate time -> slerped pose -> reprojection.
        def proj_with(q, t):
            p_cam = _quat_rotate(q, pts) + t
            return _project_points(
                p_cam, K, camera_model, radial, tangential, width, height
            )

        img0, valid0 = proj_with(q0[None, None, :], t_w2c[None, None, :])
        img1, valid1 = proj_with(q1[None, None, :], t1[None, None, :])
        img_pts = jnp.where(valid0[..., None], img0, img1)
        init_valid = valid0 | valid1
        pt_valid = init_valid
        for _ in range(N_ROLLING_SHUTTER_ITERATIONS):
            rft = _shutter_time(img_pts, shutter_type, width, height)  # [C,7]
            q_rs = _quat_slerp(q0, q1, rft)  # [C,7,4]
            t_rs = (1.0 - rft)[..., None] * t_w2c + rft[..., None] * t1
            img_rs, valid_rs = proj_with(q_rs, t_rs)
            img_pts = jnp.where(init_valid[..., None], img_rs, img_pts)
            pt_valid = init_valid & valid_rs
    else:
        p_cam = jnp.einsum(
            "ckj,ij->cki", pts, rot_w2c, precision=jax.lax.Precision.HIGHEST
        ) + t_w2c[None, None, :]
        img_pts, pt_valid = _project_points(
            p_cam, K, camera_model, radial, tangential, width, height
        )  # [C,7,2], [C,7]
    valid &= jnp.all(pt_valid, axis=1)  # require_all_sigma_points_valid=true

    mean2d = jnp.sum(w_mean[None, :, None] * img_pts, axis=1)  # [C, 2]
    dev = img_pts - mean2d[:, None, :]  # [C, 7, 2]
    cov = jnp.einsum(
        "ck,cki,ckj->cij", w_cov[None, :].repeat(means.shape[0], 0), dev, dev,
        precision=jax.lax.Precision.HIGHEST,
    )  # [C, 2, 2]
    c_xx = cov[:, 0, 0] + eps2d
    c_xy = cov[:, 0, 1]
    c_yy = cov[:, 1, 1] + eps2d

    det = c_xx * c_yy - c_xy * c_xy
    valid &= det >= 1e-8
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    conic = jnp.stack([c_yy / safe_det, -c_xy / safe_det, c_xx / safe_det], axis=-1)

    if antialiasing:
        # compensation factor vs the un-dilated covariance
        # (ProjectionUT3DGSFused.cu compensations output; rasterizer.cpp:181)
        det_raw = (c_xx - eps2d) * (c_yy - eps2d) - c_xy * c_xy
        comp = jnp.sqrt(jnp.maximum(det_raw, 0.0) / safe_det)
        opacity = opacity * comp
        valid &= opacity >= MIN_ALPHA_THRESHOLD

    # tile bounds + exact contribution mask (shared with the EWA path)
    power_threshold = jnp.log(jnp.maximum(opacity, MIN_ALPHA_THRESHOLD) * MIN_ALPHA_THRESHOLD_RCP)
    ptf = jnp.sqrt(jnp.maximum(2.0 * power_threshold, 0.0))
    extent_x = jnp.maximum(ptf * jnp.sqrt(jnp.maximum(c_xx, 0.0)) - 0.5, 0.0)
    extent_y = jnp.maximum(ptf * jnp.sqrt(jnp.maximum(c_yy, 0.0)) - 0.5, 0.0)
    ts = float(tile_size)
    x_min = jnp.clip(jnp.floor((mean2d[:, 0] - extent_x) / ts).astype(jnp.int32), 0, grid_w)
    x_max = jnp.clip(jnp.ceil((mean2d[:, 0] + extent_x) / ts).astype(jnp.int32), 0, grid_w)
    y_min = jnp.clip(jnp.floor((mean2d[:, 1] - extent_y) / ts).astype(jnp.int32), 0, grid_h)
    y_max = jnp.clip(jnp.ceil((mean2d[:, 1] + extent_y) / ts).astype(jnp.int32), 0, grid_h)
    bb_w = x_max - x_min
    area = bb_w * (y_max - y_min)
    valid &= area > 0
    bbox = jnp.stack([x_min, x_max, y_min, y_max], axis=-1)

    k = jnp.arange(EXACT_TILE_CAP, dtype=jnp.int32)[:, None]  # [K, 1]
    safe_w = jnp.maximum(bb_w, 1)[None, :]
    cand_x = x_min[None, :] + k % safe_w  # [K, C]
    cand_y = y_min[None, :] + k // safe_w
    in_bbox = k < area[None, :]
    contrib = _will_contribute(
        (mean2d[:, 0] - 0.5)[None, :], (mean2d[:, 1] - 0.5)[None, :],
        conic[:, 0][None, :], conic[:, 1][None, :], conic[:, 2][None, :],
        cand_x, cand_y, power_threshold[None, :], tile_size,
    )
    # exact_tile_test=False keeps the conservative full bbox — required by
    # the per-pixel world-space blend, whose footprint is not bounded by the
    # UT conic the exact test evaluates
    use_exact = (area <= EXACT_TILE_CAP) & valid & exact_tile_test
    bits = jnp.where(in_bbox & contrib, jnp.int32(1) << k, 0)
    mask_all = jnp.sum(bits, axis=0)
    tile_mask = jnp.where(use_exact, mask_all, 0)
    n_exact = jax.lax.population_count(mask_all)
    n_touched = jnp.where(use_exact, n_exact, area)
    valid &= n_touched > 0
    n_touched = jnp.where(valid, n_touched, 0)
    tile_mask = jnp.where(valid, tile_mask, 0)

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
