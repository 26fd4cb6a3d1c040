"""Streaming exact world-space blend (kernels/world_blend_pallas.py) tests.

Parity bars: the dense [T, K, P] world blend (ops/world_blend.py — itself
validated against the per-pixel oracle in test_world_blend.py) on both
values and gradients, for pinhole and fisheye GLOBAL-shutter cameras; and
EXACTNESS past the dense path's k_max truncation (the reference kernel
RasterizeToPixelsFromWorld3DGSFwd.cu never truncates — deep tiles must
blend every counted instance). Runs in Pallas interpret mode on CPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.core.camera import CameraModelType
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from tests.scene_utils import make_camera, make_random_splats

W, H = 64, 48


def _render(splats, cam, mode, k_max=512, cam_grad=False, with_depth=False):
    return rasterize(
        splats, cam, jnp.zeros(3), mode=mode, instance_cap=8192, k_max=k_max,
        projection="ut", gut_exact=True, cam_grad=cam_grad,
        with_depth=with_depth,
    )


def test_stream_matches_dense_pinhole(rng):
    splats = make_random_splats(rng, n=40, spread=1.0, sh_degree=1)
    cam = make_camera(W, H).device_params()
    dense = _render(splats, cam, "tiles")
    stream = _render(splats, cam, "pallas")
    err = np.abs(np.asarray(dense.image) - np.asarray(stream.image))
    assert np.median(err) < 1e-5, np.median(err)
    assert err.max() < 1e-2, err.max()  # bf16 color stream vs dense f32
    aerr = np.abs(np.asarray(dense.alpha) - np.asarray(stream.alpha))
    assert aerr.max() < 1e-4, aerr.max()


def test_stream_matches_dense_fisheye(rng):
    splats = make_random_splats(rng, n=40, spread=1.0, sh_degree=0)
    cam = make_camera(W, H)
    cam.camera_model = CameraModelType.OPENCV_FISHEYE
    cam.radial_distortion = np.asarray([0.05, -0.01, 0.0, 0.0], np.float32)
    p = cam.device_params()
    dense = _render(splats, p, "tiles")
    stream = _render(splats, p, "pallas")
    err = np.abs(np.asarray(dense.image) - np.asarray(stream.image))
    assert np.median(err) < 1e-5, np.median(err)
    assert err.max() < 1e-2, err.max()


def test_stream_exact_past_kmax_truncation(rng):
    """Deep tile: more instances than the dense path's k_max. The dense blend
    truncates (VERDICT r3 item 1); the streaming kernel must match the
    UNTRUNCATED dense result."""
    # translucent, concentrated gaussians so >32 genuinely contribute per tile
    splats = make_random_splats(
        rng, n=96, spread=0.25, sh_degree=0, opacity_range=(0.05, 0.25)
    )
    cam = make_camera(W, H).device_params()
    full = _render(splats, cam, "tiles", k_max=512)  # effectively untruncated
    trunc = _render(splats, cam, "tiles", k_max=32)
    stream = _render(splats, cam, "pallas", k_max=32)  # k_max must be ignored
    err_full = np.abs(np.asarray(full.image) - np.asarray(stream.image))
    err_trunc = np.abs(np.asarray(full.image) - np.asarray(trunc.image))
    assert err_trunc.max() > 1e-3, "fixture too shallow — k_max never bound"
    assert np.median(err_full) < 1e-5, np.median(err_full)
    assert err_full.max() < 1e-2, err_full.max()


def test_stream_vjp_matches_dense(rng):
    """Gradient parity with the dense autodiff path on every parameter group
    (the dense path's VJP is plain XLA autodiff through the oracle math)."""
    splats = make_random_splats(rng, n=32, spread=0.8, sh_degree=0)
    cam = make_camera(W, H).device_params()
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss(params, mode):
        s = splats.replace_trainable(params)
        out = _render(s, cam, mode)
        return jnp.mean((out.image - gt) ** 2) + 0.1 * jnp.mean(out.alpha)

    p = splats.trainable_dict()
    gd = jax.grad(lambda q: loss(q, "tiles"))(p)
    gs = jax.grad(lambda q: loss(q, "pallas"))(p)
    n = int(splats.n_active)
    for k in ("means", "scaling", "rotation", "opacity", "sh0"):
        a = np.asarray(gd[k])[:n]
        b = np.asarray(gs[k])[:n]
        assert np.isfinite(b).all(), k
        scale = np.abs(a).max() + 1e-12
        rel = np.abs(a - b).max() / scale
        # colors stream as bf16 (straight-through) and the moment matmul is
        # a 3-pass bf16 split — a few 1e-3 relative is the documented budget
        assert rel < 5e-2, f"{k}: rel err {rel}"


def test_stream_depth_channel(rng):
    splats = make_random_splats(rng, n=24, spread=0.8, sh_degree=0)
    cam = make_camera(W, H).device_params()
    dense = _render(splats, cam, "tiles", with_depth=True)
    stream = _render(splats, cam, "pallas", with_depth=True)
    err = np.abs(np.asarray(dense.depth) - np.asarray(stream.depth))
    assert np.median(err) < 1e-4, np.median(err)


def _rs_cam(cam, dx=0.0, rot_deg=0.0):
    """Rolling-shutter camera: end-of-frame pose translated by dx and/or
    rotated about Y by rot_deg."""
    from lichtfeld_studio_tpu.core.camera import ShutterType

    p0 = cam.device_params()
    w2c1 = np.asarray(cam.w2c).copy()
    w2c1[0, 3] += dx
    if rot_deg:
        a = np.deg2rad(rot_deg)
        ry = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
            np.float64,
        )
        w2c1[:3, :3] = w2c1[:3, :3] @ ry
    return dataclasses.replace(
        p0, w2c_end=jnp.asarray(w2c1.astype(np.float32)),
        shutter_type=ShutterType.ROLLING_TOP_TO_BOTTOM,
    )


def test_stream_rolling_shutter_translation_matches_dense(rng):
    """Rolling shutter with TRANSLATION-ONLY inter-frame motion: the
    tau-affine origin model (pack_world_stream_rs) is EXACT, so the
    streaming kernel must match the dense per-pixel-origin path to the same
    tolerance as the global-shutter tests (bf16 color stream)."""
    splats = make_random_splats(rng, n=40, spread=1.0, sh_degree=0)
    p_rs = _rs_cam(make_camera(W, H), dx=0.25)
    a = _render(splats, p_rs, "tiles")
    b = _render(splats, p_rs, "pallas")
    err = np.abs(np.asarray(a.image) - np.asarray(b.image))
    assert np.median(err) < 1e-5, np.median(err)
    assert err.max() < 1e-2, err.max()
    # sanity: the shutter must actually shear the image vs global
    g = _render(splats, make_camera(W, H).device_params(), "tiles")
    assert np.abs(np.asarray(a.image) - np.asarray(g.image)).max() > 1e-3


def test_stream_rolling_shutter_rotation_close_to_dense(rng):
    """With inter-frame ROTATION the chordal origin model deviates from the
    dense path's slerp origins by <= |t| * theta^2 / 8 (documented bound) —
    sub-pixel for physical shutters. Directions stay exact (they come from
    the same slerp ray table)."""
    splats = make_random_splats(rng, n=40, spread=1.0, sh_degree=0)
    p_rs = _rs_cam(make_camera(W, H), dx=0.1, rot_deg=2.0)
    a = _render(splats, p_rs, "tiles")
    b = _render(splats, p_rs, "pallas")
    err = np.abs(np.asarray(a.image) - np.asarray(b.image))
    assert np.median(err) < 1e-4, np.median(err)
    assert err.max() < 3e-2, err.max()


def test_stream_rolling_shutter_deep_past_kmax(rng):
    """Deep rolling-shutter tile past the dense path's k_max: the streaming
    kernel blends every counted instance at full depth (multi-chunk) —
    the capability the dense fallback only had truncated."""
    splats = make_random_splats(
        rng, n=160, spread=0.25, sh_degree=0, opacity_range=(0.05, 0.25)
    )
    p_rs = _rs_cam(make_camera(W, H), dx=0.2)
    full = _render(splats, p_rs, "tiles", k_max=512)
    trunc = _render(splats, p_rs, "tiles", k_max=32)
    stream = _render(splats, p_rs, "pallas", k_max=32)
    err_full = np.abs(np.asarray(full.image) - np.asarray(stream.image))
    err_trunc = np.abs(np.asarray(full.image) - np.asarray(trunc.image))
    assert err_trunc.max() > 1e-3, "fixture too shallow — k_max never bound"
    assert np.median(err_full) < 1e-5, np.median(err_full)
    assert err_full.max() < 1e-2, err_full.max()


def test_stream_rolling_shutter_vjp_matches_dense(rng):
    """Gradient parity for the rolling-shutter streaming backward
    (translation-only motion: the origin model is exact, so deviations are
    the stream's documented bf16/3-pass budgets)."""
    splats = make_random_splats(rng, n=32, spread=0.8, sh_degree=0)
    p_rs = _rs_cam(make_camera(W, H), dx=0.2)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss(params, mode):
        s = splats.replace_trainable(params)
        out = _render(s, p_rs, mode)
        return jnp.mean((out.image - gt) ** 2) + 0.1 * jnp.mean(out.alpha)

    p = splats.trainable_dict()
    gd = jax.grad(lambda q: loss(q, "tiles"))(p)
    gs = jax.grad(lambda q: loss(q, "pallas"))(p)
    n = int(splats.n_active)
    for k in ("means", "scaling", "rotation", "opacity", "sh0"):
        a = np.asarray(gd[k])[:n]
        b = np.asarray(gs[k])[:n]
        assert np.isfinite(b).all(), k
        scale = np.abs(a).max() + 1e-12
        rel = np.abs(a - b).max() / scale
        assert rel < 5e-2, f"{k}: rel err {rel}"
