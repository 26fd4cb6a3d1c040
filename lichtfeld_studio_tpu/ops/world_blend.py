"""Exact per-pixel world-space (3DGUT) rasterization.

Reference: gsplat/RasterizeToPixelsFromWorld3DGSFwd.cu:20-442 and
RasterizeToPixelsFromWorld3DGSBwd.cu:17-561. Instead of blending a 2D conic
approximation, every pixel casts a world ray through the (possibly
distorted, possibly rolling-shutter) camera model and evaluates each 3D
gaussian at the ray's closest approach in the gaussian's normalized frame:

    M    = diag(1/s) R^T                    (iscl_rot, Fwd.cu:207-219)
    gro  = M (ray_o - mean)
    grd  = normalize(M ray_d)
    dist = |grd x gro|^2                    (squared min Mahalanobis distance)
    alpha = min(0.999, opac * exp(-0.5 dist))

TPU shape: rays are precomputed as a per-pixel table (the camera-model
INVERSE is evaluated once per pixel, vectorized — the CUDA kernel re-derives
it per pixel per block), and the blend reuses the shared tile machinery:
binning by the UT-projected conservative bounds, features gathered per
instance through the scatter-free custom-VJP gather, dense per-tile
evaluation + masked front-to-back compositing. Differentiable end-to-end:
the eval is an elementwise chain on gathered features, so the backward's
per-gaussian reduction rides the same slot-sort as the fast path — no
atomics, no scatters (vs the reference Bwd.cu's warp-atomic accumulation).

Inverse camera models (Cameras.cuh): PINHOLE :457, OpenCV-pinhole Newton
undistortion :700-747, fisheye inverse-polynomial Newton :961-1004,
rolling-shutter world rays :322-341 (pixel scanline time is exact here — no
fixed-point iteration needed on the inverse path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.core.camera import CameraModelType, ShutterType
from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat
from lichtfeld_studio_tpu.ops.projection import (
    MAX_FRAGMENT_ALPHA,
    MIN_ALPHA_THRESHOLD,
)
from lichtfeld_studio_tpu.ops.tiles import TileAssignment
from lichtfeld_studio_tpu.ops.ut_projection import (
    _quat_rotate,
    _quat_slerp,
    _rotmat_to_quat,
    _shutter_time,
)


def _undistort_opencv_newton(xd, yd, radial, tangential, iters: int = 5):
    """Invert the OpenCV rational radial+tangential distortion by Newton
    iteration on normalized coords (Cameras.cuh:700-747)."""
    k = jnp.zeros(6).at[: radial.shape[0]].set(radial) if radial.shape[0] else jnp.zeros(6)
    p = jnp.zeros(2).at[: tangential.shape[0]].set(tangential) if tangential.shape[0] else jnp.zeros(2)

    def fwd(x, y):
        r2 = x * x + y * y
        num = 1.0 + r2 * (k[0] + r2 * (k[1] + r2 * k[2]))
        den = 1.0 + r2 * (k[3] + r2 * (k[4] + r2 * k[5]))
        icd = num / den
        fx = icd * x + 2.0 * p[0] * x * y + p[1] * (r2 + 2.0 * x * x) - xd
        fy = icd * y + 2.0 * p[1] * x * y + p[0] * (r2 + 2.0 * y * y) - yd
        return fx, fy

    x, y = xd, yd
    for _ in range(iters):
        # 2x2 Jacobian via two jvp evaluations (elementwise, XLA-fused)
        (fx, fy), (gx1, gy1) = jax.jvp(
            lambda ab: fwd(ab[0], ab[1]), ((x, y),),
            ((jnp.ones_like(x), jnp.zeros_like(y)),),
        )
        _, (gx2, gy2) = jax.jvp(
            lambda ab: fwd(ab[0], ab[1]), ((x, y),),
            ((jnp.zeros_like(x), jnp.ones_like(y)),),
        )
        det = gx1 * gy2 - gx2 * gy1
        det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        x = x - (fx * gy2 - fy * gx2) / det
        y = y - (fy * gx1 - fx * gy1) / det
    return x, y


def _fisheye_theta_newton(delta, radial, iters: int = 10):
    """Solve delta = theta (1 + k1 t^2 + k2 t^4 + k3 t^6 + k4 t^8) for theta
    (the equidistant fisheye forward polynomial, Cameras.cuh:961-983)."""
    k = jnp.zeros(4).at[: min(radial.shape[0], 4)].set(radial[:4]) if radial.shape[0] else jnp.zeros(4)
    theta = delta
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3])))) - delta
        df = 1.0 + t2 * (3.0 * k[0] + t2 * (5.0 * k[1] + t2 * (7.0 * k[2] + t2 * 9.0 * k[3])))
        theta = theta - f / jnp.where(jnp.abs(df) > 1e-9, df, 1e-9)
    return theta


def camera_ray_table(
    K: jax.Array,  # [4] fx fy cx cy
    camera_model: int,
    radial: jax.Array,
    tangential: jax.Array,
    width: int,
    height: int,
    tile_size: int = 16,
) -> jax.Array:
    """Per-pixel camera-space ray directions on the tile-padded grid
    -> [Hp, Wp, 3] (padded to tile multiples, row-major pixels)."""
    grid_w = -(-width // tile_size)
    grid_h = -(-height // tile_size)
    wp, hp = grid_w * tile_size, grid_h * tile_size
    ys, xs = jnp.mgrid[0:hp, 0:wp]
    px = xs.astype(jnp.float32) + 0.5
    py = ys.astype(jnp.float32) + 0.5
    fx, fy, cx, cy = K[0], K[1], K[2], K[3]
    u = (px - cx) / fx
    v = (py - cy) / fy
    if camera_model == CameraModelType.ORTHO:
        dirs = jnp.stack([jnp.zeros_like(u), jnp.zeros_like(v), jnp.ones_like(u)], -1)
    elif camera_model == CameraModelType.OPENCV_FISHEYE:
        delta = jnp.sqrt(u * u + v * v)
        theta = _fisheye_theta_newton(delta, radial)
        scale = jnp.where(delta > 1e-8, jnp.sin(theta) / jnp.maximum(delta, 1e-8), 1.0)
        dirs = jnp.stack([scale * u, scale * v, jnp.cos(theta)], -1)
    else:
        if camera_model == CameraModelType.OPENCV_PINHOLE and (
            radial.shape[0] or tangential.shape[0]
        ):
            u, v = _undistort_opencv_newton(u, v, radial, tangential)
        dirs = jnp.stack([u, v, jnp.ones_like(u)], -1)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs


def world_ray_table(
    w2c: jax.Array,
    K: jax.Array,
    camera_model: int,
    radial: jax.Array,
    tangential: jax.Array,
    width: int,
    height: int,
    tile_size: int = 16,
    w2c_end: jax.Array | None = None,
    shutter_type: int = ShutterType.GLOBAL,
) -> tuple[jax.Array, jax.Array]:
    """World-space (ray_o, ray_d), each [Hp*Wp, 3] in row-major pixel order.
    Rolling shutter: each pixel uses its scanline's slerped pose
    (Cameras.cuh:322-341 image_point_to_world_ray_shutter_pose)."""
    cam_dirs = camera_ray_table(
        K, camera_model, radial, tangential, width, height, tile_size
    )
    hp, wp = cam_dirs.shape[:2]
    d = cam_dirs.reshape(-1, 3)
    rolling = shutter_type != ShutterType.GLOBAL and w2c_end is not None
    if not rolling:
        r_inv = w2c[:3, :3].T
        o = (-r_inv @ w2c[:3, 3])[None, :]
        ray_d = d @ r_inv.T
        ray_o = jnp.broadcast_to(o, ray_d.shape)
        return ray_o, ray_d
    q0 = _rotmat_to_quat(w2c[:3, :3])
    q1 = _rotmat_to_quat(w2c_end[:3, :3])
    t0, t1 = w2c[:3, 3], w2c_end[:3, 3]
    ys, xs = jnp.mgrid[0:hp, 0:wp]
    pts = jnp.stack([xs.astype(jnp.float32) + 0.5, ys.astype(jnp.float32) + 0.5], -1)
    t = _shutter_time(pts.reshape(-1, 2), shutter_type, width, height)  # [P]
    q_rs = _quat_slerp(q0, q1, t)  # [P, 4]
    t_rs = (1.0 - t)[:, None] * t0 + t[:, None] * t1
    q_inv = q_rs * jnp.asarray([1.0, -1.0, -1.0, -1.0])
    ray_o = _quat_rotate(q_inv, -t_rs)
    ray_d = _quat_rotate(q_inv, d)
    return ray_o, ray_d


def pack_world_features(
    means: jax.Array,  # [C, 3]
    log_scales: jax.Array,  # [C, 3]
    quats: jax.Array,  # [C, 4]
    opacity: jax.Array,  # [C] activated
    color: jax.Array,  # [C, 3]
    depth: jax.Array | None = None,
) -> jax.Array:
    """[C, 16] rows: 0-2 mean, 3-6 normalized quat, 7-9 1/scale, 10 opacity,
    11-13 rgb, 14 depth/aux, 15 pad."""
    c = means.shape[0]
    qn = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    inv_s = jnp.exp(-log_scales)
    zeros = jnp.zeros((c,), means.dtype)
    depth_ch = depth if depth is not None else zeros
    return jnp.concatenate(
        [
            means,
            qn,
            inv_s,
            opacity[:, None],
            color[:, :3],
            depth_ch[:, None],
            zeros[:, None],
        ],
        axis=-1,
    )


def _alphas_world(f, ray_o, ray_d):
    """f [T,K,16], ray_o/ray_d [T,P,3] -> alpha [T,K,P]
    (Fwd.cu:228-241 per-pixel gaussian evaluation)."""
    mean = f[..., 0:3]
    quat = f[..., 3:7]
    inv_s = f[..., 7:10]
    opac = f[..., 10]
    rot = quat_to_rotmat(quat.reshape(-1, 4)).reshape(quat.shape[:-1] + (3, 3))
    # M = diag(1/s) R^T  -> rows m_i = inv_s[i] * R[:, i]
    m = inv_s[..., :, None] * jnp.swapaxes(rot, -1, -2)  # [T,K,3,3]

    o_rel = ray_o[:, None, :, :] - mean[:, :, None, :]  # [T,K,P,3]
    # precision=HIGHEST: TPU's DEFAULT einsum runs bf16 passes (PERFNOTES
    # numerics rules) — these tiny matvecs feed exp(), where bf16 operand
    # rounding showed up as ~0.09 max alpha error vs the f32 streaming
    # kernel on the compiled parity gate
    gro = jnp.einsum("tkij,tkpj->tkpi", m, o_rel,
                     precision=jax.lax.Precision.HIGHEST)
    grd = jnp.einsum("tkij,tpj->tkpi", m, ray_d,
                     precision=jax.lax.Precision.HIGHEST)
    n2 = jnp.sum(grd * grd, axis=-1)
    inv_n2 = 1.0 / jnp.maximum(n2, 1e-18)
    cr = jnp.cross(grd, gro)
    dist = jnp.sum(cr * cr, axis=-1) * inv_n2
    alpha = opac[..., None] * jnp.exp(-0.5 * dist)
    alpha = jnp.minimum(alpha, MAX_FRAGMENT_ALPHA)
    return jnp.where(alpha >= MIN_ALPHA_THRESHOLD, alpha, 0.0)


def world_blend_tiles(
    feat: jax.Array,  # [I, 16] gathered instance features (pack_world_features)
    rays_o: jax.Array,  # [Hp*Wp, 3]
    rays_d: jax.Array,  # [Hp*Wp, 3]
    assignment: TileAssignment,
    *,
    grid_w: int,
    grid_h: int,
    tile_size: int,
    k_max: int,
    n_channels: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """Per-tile dense world-space blend (structure mirrors
    ops.blend_tiles.blend_tiles; this is the exact GUT path's fallback /
    oracle — the Pallas streaming variant shares the same math)."""
    from lichtfeld_studio_tpu.ops.blend_ref import blend_along_axis

    ts = tile_size
    num_tiles = grid_w * grid_h
    i_cap = feat.shape[0]

    start = assignment.tile_start
    count = jnp.minimum(assignment.tile_count, k_max)
    k = jnp.arange(k_max, dtype=jnp.int32)
    idx = jnp.clip(start[:, None] + k[None, :], 0, i_cap - 1)  # [T, K]
    in_range = k[None, :] < count[:, None]

    f = feat[idx]  # [T, K, 16]
    opac_masked = jnp.where(in_range, f[..., 10], 0.0)
    f = f.at[..., 10].set(opac_masked)
    colors = f[..., 11 : 11 + n_channels]

    # per-tile pixel rays: rays are row-major over the padded image; regroup
    # into [T, P, 3] tile blocks
    hp, wp = grid_h * ts, grid_w * ts
    ro = rays_o.reshape(grid_h, ts, grid_w, ts, 3).transpose(0, 2, 1, 3, 4).reshape(num_tiles, ts * ts, 3)
    rd = rays_d.reshape(grid_h, ts, grid_w, ts, 3).transpose(0, 2, 1, 3, 4).reshape(num_tiles, ts * ts, 3)

    alphas = _alphas_world(f, ro, rd)  # [T, K, P]
    color_out, t_final = blend_along_axis(alphas, colors)  # [T, P, C], [T, P]

    image = (
        color_out.reshape(grid_h, grid_w, ts, ts, n_channels)
        .transpose(0, 2, 1, 3, 4)
        .reshape(hp, wp, n_channels)
    )
    alpha_map = (
        (1.0 - t_final).reshape(grid_h, grid_w, ts, ts).transpose(0, 2, 1, 3).reshape(hp, wp)
    )
    return image, alpha_map
