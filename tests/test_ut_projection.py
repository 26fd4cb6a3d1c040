"""UT (3DGUT) projection tests (parity bar: reference test_basic.cpp camera
model sections + projection UT vs EWA consistency)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.core.camera import CameraModelType
from lichtfeld_studio_tpu.ops.projection import project_gaussians
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.ops.ut_projection import project_gaussians_ut
from tests.scene_utils import make_camera, make_random_splats


def _proj_args(splats, cam):
    return (
        splats.means, splats.scaling, splats.rotation, splats.opacity,
        splats.sh0, splats.shN, splats.active_mask(), splats.active_sh_degree,
        jnp.asarray(cam.w2c), jnp.asarray(cam.cam_position),
        jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32),
    )


def test_ut_pinhole_matches_ewa_mean(rng):
    """For a perfect pinhole, the UT image mean must match the EWA projected
    center closely (small gaussians -> nearly linear projection)."""
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=48)
    p_ewa = project_gaussians(*_proj_args(splats, cam), width=64, height=48)
    p_ut = project_gaussians_ut(*_proj_args(splats, cam), width=64, height=48)
    v = np.asarray(p_ewa.valid) & np.asarray(p_ut.valid)
    assert v.sum() > 10
    np.testing.assert_allclose(
        np.asarray(p_ut.mean2d)[v], np.asarray(p_ewa.mean2d)[v], atol=0.25
    )
    # conics agree within the linearization error
    c1 = np.asarray(p_ut.conic)[v]
    c2 = np.asarray(p_ewa.conic)[v]
    assert np.median(np.abs(c1 - c2) / (np.abs(c2) + 1e-2)) < 0.2


def test_ut_depth_cull(rng):
    cam = make_camera()
    splats = make_random_splats(rng, n=4)
    behind = splats.replace_trainable(
        {**splats.trainable_dict(), "means": jnp.tile(jnp.asarray([[0.0, 0, -10.0]]), (4, 1))}
    )
    p = project_gaussians_ut(*_proj_args(behind, cam), width=64, height=48)
    assert not np.asarray(p.valid).any()


def test_ut_fisheye_runs(rng):
    cam = make_camera(64, 48)
    cam.camera_model = CameraModelType.OPENCV_FISHEYE
    cam.radial_distortion = np.array([0.05, -0.01, 0.0, 0.0], np.float32)
    splats = make_random_splats(rng, n=32)
    out = rasterize(
        splats, cam.device_params(), jnp.zeros(3),
        mode="tiles", instance_cap=4096, k_max=64,
    )
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # something rendered


def test_ut_distorted_pinhole_shifts_points(rng):
    """Radial distortion must move projected centers off the undistorted
    positions (away from the principal point)."""
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=32)
    p0 = project_gaussians_ut(*_proj_args(splats, cam), width=64, height=48)
    p1 = project_gaussians_ut(
        *_proj_args(splats, cam), width=64, height=48,
        camera_model=CameraModelType.OPENCV_PINHOLE,
        radial=jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.0, 0.0]),
    )
    v = np.asarray(p0.valid) & np.asarray(p1.valid)
    d = np.linalg.norm(np.asarray(p1.mean2d)[v] - np.asarray(p0.mean2d)[v], axis=1)
    assert d.max() > 0.5  # distortion visibly shifts off-center gaussians


def test_gut_rasterize_gradients(rng):
    import jax

    cam = make_camera(32, 32)
    splats = make_random_splats(rng, n=16)

    def loss(means):
        s = splats.replace_trainable({**splats.trainable_dict(), "means": means})
        out = rasterize(
            s, cam.device_params(), jnp.zeros(3),
            mode="tiles", instance_cap=2048, k_max=64, projection="ut",
        )
        return jnp.mean(out.image**2)

    g = jax.grad(loss)(splats.means)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_rolling_shutter_identity_pose_matches_global(rng):
    """With identical start/end poses, every rolling shutter type must
    reproduce the global-shutter projection exactly (Cameras.cuh:347-413:
    the fixed point is pose-independent when the poses agree)."""
    from lichtfeld_studio_tpu.core.camera import ShutterType

    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=48)
    base = project_gaussians_ut(*_proj_args(splats, cam), width=64, height=48)
    for st in (ShutterType.ROLLING_TOP_TO_BOTTOM, ShutterType.ROLLING_LEFT_TO_RIGHT):
        rs = project_gaussians_ut(
            *_proj_args(splats, cam), width=64, height=48,
            w2c_end=jnp.asarray(cam.w2c), shutter_type=st,
        )
        v = np.asarray(base.valid) & np.asarray(rs.valid)
        assert v.sum() > 10
        np.testing.assert_allclose(
            np.asarray(rs.mean2d)[v], np.asarray(base.mean2d)[v], atol=1e-3
        )


def test_rolling_shutter_moving_pose_shifts_rows(rng):
    """A camera translating during the frame must displace bottom-row
    content more than top-row content under TOP_TO_BOTTOM shutter."""
    from lichtfeld_studio_tpu.core.camera import ShutterType

    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=64, spread=1.5)
    w2c0 = np.asarray(cam.w2c)
    w2c1 = w2c0.copy()
    w2c1[0, 3] += 0.3  # translate right during the frame

    glob = project_gaussians_ut(*_proj_args(splats, cam), width=64, height=48)
    rs = project_gaussians_ut(
        *_proj_args(splats, cam), width=64, height=48,
        w2c_end=jnp.asarray(w2c1),
        shutter_type=ShutterType.ROLLING_TOP_TO_BOTTOM,
    )
    v = np.asarray(glob.valid) & np.asarray(rs.valid)
    assert v.sum() > 10
    m_g = np.asarray(glob.mean2d)[v]
    m_r = np.asarray(rs.mean2d)[v]
    shift = m_r[:, 0] - m_g[:, 0]
    ys = m_g[:, 1]
    top = shift[ys < np.median(ys)]
    bottom = shift[ys >= np.median(ys)]
    # content captured later (bottom rows) must be shifted strictly more
    assert np.mean(np.abs(bottom)) > np.mean(np.abs(top)) + 1e-3
    # and the rolling projection must differ from global overall
    assert np.max(np.abs(shift)) > 0.05
