"""Integration: pose optimization + bilateral grid + bg modulation +
sparsity running inside the real jitted train step (aux Adam over nested
pytrees, scheduled LRs, ADMM phases)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.train.state import (
    TrainConfig, init_train_state, make_lrs, step_flags, train_step,
)
from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig
from tests.scene_utils import make_camera, make_random_splats


@pytest.mark.slow
def test_train_step_with_pose_and_bilateral(rng):
    splats = make_random_splats(rng, n=24, capacity=48)
    cam = make_camera(32, 32)
    cam.uid = 1
    bg = jnp.zeros(3)
    target = rasterize(splats, cam.device_params(), bg, mode="tiles",
                       instance_cap=2048, k_max=64).image
    cfg = TrainConfig(
        raster_mode="tiles", instance_cap=2048, k_max=64, lr_gamma=1.0,
        mcmc=MCMCConfig(max_cap=48, start_refine=10**9, stop_refine=10**9 + 1),
        pose_mode="direct", use_bilateral_grid=True, tv_loss_weight=1.0,
        bg_modulation=True,
    )
    lrs = make_lrs(1.6e-3, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    state = init_train_state(splats, lrs, cfg=cfg, num_cameras=3, seed=0)
    assert "pose" in state.aux_params and "bilateral" in state.aux_params

    losses = []
    for i in range(12):
        state, m = train_step(state, cam.device_params(), target, bg, cfg,
                              step_flags(cfg, i + 1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # pose embedding for camera 1 received updates; others untouched
    emb = np.asarray(state.aux_params["pose"]["embeddings"])
    assert np.abs(emb[1]).sum() > 0
    assert np.abs(emb[0]).sum() == 0
    # bilateral grid moved off identity
    grids = np.asarray(state.aux_params["bilateral"])
    assert np.abs(grids[1]).sum() != 0
    assert float(state.aux_adam.lr["bilateral"]) > 0


@pytest.mark.slow
def test_train_step_sparsity_phase(rng):
    splats = make_random_splats(rng, n=24, capacity=48)
    cam = make_camera(32, 32)
    bg = jnp.zeros(3)
    target = rasterize(splats, cam.device_params(), bg, mode="tiles",
                       instance_cap=2048, k_max=64).image
    cfg = TrainConfig(
        iterations=20, raster_mode="tiles", instance_cap=2048, k_max=64,
        lr_gamma=1.0,
        mcmc=MCMCConfig(max_cap=48, start_refine=10**9, stop_refine=10**9 + 1),
        enable_sparsity=True, sparsify_steps=10, sparsity_rho=1e-3,
        sparsity_prune_ratio=0.5,
    )
    assert cfg.base_iterations == 10
    lrs = make_lrs(1.6e-3, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    state = init_train_state(splats, lrs, cfg=cfg, num_cameras=1, seed=0)
    for i in range(20):
        fl = step_flags(cfg, i + 1)
        if i + 1 == 11:
            assert fl.admm_init and fl.sparsity_phase
        state, m = train_step(state, cam.device_params(), target, bg, cfg, fl)
        assert np.isfinite(float(m["loss"]))
    # ADMM duals initialized (z has zeros for the pruned fraction)
    z = np.asarray(state.admm_z[:24])
    assert (z == 0).sum() >= 10
