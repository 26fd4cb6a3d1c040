"""Synthetic scene builders shared by the test suites (the stand-in for the
reference's golden garden tensors, tests/test_data_loader.hpp)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.core.camera import Camera, look_at_camera
from lichtfeld_studio_tpu.core.splat_data import SplatData


def make_camera(width: int = 64, height: int = 48, fov_scale: float = 1.0) -> Camera:
    return look_at_camera(
        eye=np.array([0.0, 0.0, -4.0]),
        target=np.array([0.0, 0.0, 0.0]),
        up=np.array([0.0, -1.0, 0.0]),
        fx=60.0 * fov_scale,
        fy=60.0 * fov_scale,
        width=width,
        height=height,
    )


def make_random_splats(
    rng: np.random.Generator,
    n: int = 64,
    capacity: int | None = None,
    spread: float = 1.2,
    sh_degree: int = 3,
    opacity_range: tuple[float, float] = (0.3, 0.95),
) -> SplatData:
    capacity = capacity or n
    positions = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    colors = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    sd = SplatData.from_point_cloud(
        positions, colors, np.zeros(3, np.float32), capacity=capacity, max_sh_degree=sh_degree
    )
    # Give the gaussians visible size / varied shape / rotation / opacity
    log_s = rng.uniform(np.log(0.02), np.log(0.15), (n, 3)).astype(np.float32)
    quat = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    op = rng.uniform(*opacity_range, (n, 1)).astype(np.float32)
    logit_op = np.log(op / (1 - op)).astype(np.float32)
    shn = 0.05 * rng.normal(0, 1, ((n,) + sd.shN.shape[1:])).astype(np.float32)

    sd = sd.replace_trainable(
        dict(
            means=sd.means,
            sh0=sd.sh0,
            shN=sd.shN.at[:n].set(jnp.asarray(shn)),
            scaling=sd.scaling.at[:n].set(jnp.asarray(log_s)),
            rotation=sd.rotation.at[:n].set(jnp.asarray(quat)),
            opacity=sd.opacity.at[:n].set(jnp.asarray(logit_op)),
        )
    )
    import dataclasses

    return dataclasses.replace(sd, active_sh_degree=jnp.asarray(sh_degree, jnp.int32))
