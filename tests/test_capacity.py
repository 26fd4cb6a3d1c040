"""Gaussian-capacity bucketing: growing the bucket must preserve training
state exactly and keep densification working across the growth."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.train.capacity import grow_capacity, initial_capacity
from lichtfeld_studio_tpu.train.state import (
    TrainConfig, init_train_state, make_lrs, step_flags, train_step,
)
from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig
from tests.scene_utils import make_camera, make_random_splats


def test_initial_capacity_buckets():
    assert initial_capacity(30_000, 1_000_000) == 65536  # 2x headroom, pow2
    assert initial_capacity(600_000, 1_000_000) == 1_000_000  # clamped
    assert initial_capacity(10, 1_000_000) == 2**15  # floor


def test_grow_preserves_state_and_render(rng):
    splats = make_random_splats(rng, n=24, capacity=32)
    cam = make_camera(32, 32)
    bg = jnp.zeros(3)
    lrs = make_lrs(1.6e-3, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    cfg = TrainConfig(
        raster_mode="tiles", instance_cap=2048, k_max=64,
        mcmc=MCMCConfig(max_cap=32, start_refine=1, stop_refine=100, refine_every=2),
        lr_gamma=1.0,
    )
    state = init_train_state(splats, lrs, seed=0)
    target = rasterize(splats, cam.device_params(), bg, mode="tiles",
                       instance_cap=2048, k_max=64).image
    for i in range(4):
        state, _ = train_step(state, cam.device_params(), target, bg, cfg,
                              step_flags(cfg, i + 1))

    img_before = rasterize(state.splats, cam.device_params(), bg,
                           mode="tiles", instance_cap=2048, k_max=64).image
    grown = grow_capacity(state, 64)
    assert grown.splats.capacity == 64
    assert int(grown.splats.n_active) == int(state.splats.n_active)
    np.testing.assert_array_equal(
        np.asarray(grown.splats.means[:32]), np.asarray(state.splats.means)
    )
    np.testing.assert_array_equal(
        np.asarray(grown.adam.exp_avg["means"][:32]),
        np.asarray(state.adam.exp_avg["means"]),
    )
    img_after = rasterize(grown.splats, cam.device_params(), bg,
                          mode="tiles", instance_cap=2048, k_max=64).image
    np.testing.assert_allclose(np.asarray(img_after), np.asarray(img_before), atol=1e-6)

    # densification keeps working in the bigger bucket
    cfg2 = dataclasses.replace(cfg, mcmc=dataclasses.replace(cfg.mcmc, max_cap=64))
    n0 = int(grown.splats.n_active)
    grown, _ = train_step(grown, cam.device_params(), target, bg, cfg2,
                          step_flags(cfg2, 6))  # refine step (6 % 2 == 0)
    assert int(grown.splats.n_active) > n0