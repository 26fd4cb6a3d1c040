"""Projection preprocess tests (parity bar: reference test_basic.cpp
projection sections; semantics from fastgs kernels_forward.cuh:18-205)."""

import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.ops.projection import project_gaussians
from tests.scene_utils import make_camera, make_random_splats


def _project(splats, cam, **kw):
    return project_gaussians(
        splats.means,
        splats.scaling,
        splats.rotation,
        splats.opacity,
        splats.sh0,
        splats.shN,
        splats.active_mask(),
        splats.active_sh_degree,
        jnp.asarray(cam.w2c),
        jnp.asarray(cam.cam_position),
        jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32),
        width=cam.width,
        height=cam.height,
        **kw,
    )


def test_center_gaussian_projects_to_principal_point(rng):
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=1)
    splats = splats.replace_trainable(
        {**splats.trainable_dict(), "means": jnp.zeros_like(splats.means)}
    )
    proj = _project(splats, cam)
    assert bool(proj.valid[0])
    np.testing.assert_allclose(np.asarray(proj.depth[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(proj.mean2d[0]), [cam.cx, cam.cy], atol=1e-4)


def test_behind_camera_culled(rng):
    cam = make_camera()
    splats = make_random_splats(rng, n=1)
    splats = splats.replace_trainable(
        {**splats.trainable_dict(), "means": jnp.array([[0.0, 0.0, -10.0]])}
    )
    proj = _project(splats, cam)
    assert not bool(proj.valid[0])
    assert int(proj.n_touched[0]) == 0


def test_isotropic_conic(rng):
    """An isotropic gaussian at the optical axis yields a diagonal conic with
    value depth^2 / (fx^2 sigma^2 + dilation*depth^2) ... verified against a
    direct dense EWA computation."""
    cam = make_camera(64, 48)
    sigma = 0.1
    splats = make_random_splats(rng, n=1)
    tr = splats.trainable_dict()
    tr["means"] = jnp.zeros((1, 3))
    tr["scaling"] = jnp.full((1, 3), np.log(sigma))
    tr["rotation"] = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    splats = splats.replace_trainable(tr)
    proj = _project(splats, cam)
    depth = 4.0
    cov2d_diag = (cam.fx / depth) ** 2 * sigma**2 + 0.3
    conic = np.asarray(proj.conic[0])
    np.testing.assert_allclose(conic[0], 1.0 / cov2d_diag, rtol=1e-4)
    np.testing.assert_allclose(conic[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(conic[2], 1.0 / cov2d_diag, rtol=1e-4)


def test_inactive_slots_masked(rng):
    cam = make_camera()
    splats = make_random_splats(rng, n=8, capacity=16)
    proj = _project(splats, cam)
    assert not np.any(np.asarray(proj.valid[8:]))
    assert np.all(np.asarray(proj.n_touched[8:]) == 0)


def test_bbox_contains_center_tile(rng):
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=32)
    proj = _project(splats, cam)
    v = np.asarray(proj.valid)
    m2d = np.asarray(proj.mean2d)
    bb = np.asarray(proj.bbox)
    for i in np.nonzero(v)[0]:
        cx_t = int(m2d[i, 0] // 16)
        cy_t = int(m2d[i, 1] // 16)
        if 0 <= cx_t < 4 and 0 <= cy_t < 3:  # on-screen center
            assert bb[i, 0] <= cx_t < bb[i, 1], (i, bb[i], m2d[i])
            assert bb[i, 2] <= cy_t < bb[i, 3]
