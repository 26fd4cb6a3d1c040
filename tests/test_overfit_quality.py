"""End-to-end optimization quality: from random init, a single view must
overfit past 20 dB within a few hundred steps (the money test for the whole
render->loss->grad->Adam->MCMC chain; parity bar: reference strategy
integration tests' convergence checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.ops.ssim import psnr
from lichtfeld_studio_tpu.train.state import (
    TrainConfig,
    init_train_state,
    make_lrs,
    step_flags,
    train_step,
)
from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig
from tests.scene_utils import make_camera, make_random_splats

RKW = dict(mode="tiles", instance_cap=8192, k_max=128)


@pytest.mark.slow
def test_single_view_overfit_from_random(rng):
    W, H = 64, 48
    gt = make_random_splats(rng, n=40, spread=0.9)
    cam = make_camera(W, H)
    bg = jnp.zeros(3)
    target = rasterize(gt, cam.device_params(), bg, **RKW).image

    sd = SplatData.random_init(
        jax.random.PRNGKey(1), num_points=256, extent=1.2, capacity=512,
        init_opacity=0.5, init_scaling=0.5,
    )
    lrs = make_lrs(1.6e-4, 2.5e-3, 5e-3, 1e-3, 0.05, sd.scene_scale)
    cfg = TrainConfig(
        iterations=250, raster_mode="tiles", instance_cap=8192, k_max=128,
        mcmc=MCMCConfig(max_cap=512, start_refine=100, stop_refine=240, refine_every=50),
        lr_gamma=0.01 ** (1 / 250),
    )
    state = init_train_state(sd, lrs, seed=0)
    p0 = float(psnr(rasterize(state.splats, cam.device_params(), bg, **RKW).image, target))
    for i in range(250):
        state, _ = train_step(
            state, cam.device_params(), target, bg, cfg, step_flags(cfg, i + 1)
        )
    p1 = float(psnr(rasterize(state.splats, cam.device_params(), bg, **RKW).image, target))
    assert p1 > 20.0, (p0, p1)
    assert int(state.splats.n_active) > 256  # MCMC grew
