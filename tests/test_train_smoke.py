"""End-to-end training smoke test: optimize a tiny synthetic scene and check
the loss drops and MCMC refinement runs (parity bar: reference
test_mcmc.cpp/test_default_strategy.cpp mini training loops)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.ops.ssim import psnr
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.train.state import (
    TrainConfig,
    init_train_state,
    make_lrs,
    step_flags,
    train_step,
)
from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig
from tests.scene_utils import make_camera, make_random_splats


def _make_targets(splats, cams):
    bg = jnp.zeros(3)
    return [
        rasterize(splats, c.device_params(), bg, mode="tiles", instance_cap=8192, k_max=128).image
        for c in cams
    ]


@pytest.mark.slow
def test_training_improves_psnr(rng):
    # ground-truth scene renders the targets; a perturbed copy trains toward them
    gt_splats = make_random_splats(rng, n=48, capacity=96)
    cams = [make_camera(48, 32), make_camera(48, 32, fov_scale=1.3)]
    targets = _make_targets(gt_splats, cams)

    noisy_means = gt_splats.means + 0.03 * jnp.asarray(
        rng.normal(0, 1, gt_splats.means.shape).astype(np.float32)
    )
    splats = gt_splats.replace_trainable(
        {**gt_splats.trainable_dict(), "means": noisy_means}
    )

    lrs = make_lrs(1.6e-3, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    state = init_train_state(splats, lrs, seed=0)
    cfg = TrainConfig(
        iterations=60,
        raster_mode="tiles",
        instance_cap=8192,
        k_max=128,
        scale_reg=0.0,
        opacity_reg=0.0,
        mcmc=MCMCConfig(max_cap=96, start_refine=10, stop_refine=50, refine_every=20),
        lr_gamma=1.0,
    )
    bg = jnp.zeros(3)

    def eval_psnr(st):
        vals = []
        for c, t in zip(cams, targets):
            img = rasterize(
                st.splats, c.device_params(), bg, mode="tiles", instance_cap=8192, k_max=128
            ).image
            vals.append(float(psnr(img, t)))
        return np.mean(vals)

    p0 = eval_psnr(state)
    losses = []
    for i in range(60):
        cam = cams[i % 2]
        state, metrics = train_step(
            state, cam.device_params(), targets[i % 2], bg, cfg,
            step_flags(cfg, i + 1),
        )
        losses.append(float(metrics["loss"]))
    p1 = eval_psnr(state)

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
    assert p1 > p0 + 0.5, (p0, p1)
    # MCMC growth happened (refine at iters 20 and 40: 48 -> 50 -> 52)
    assert int(state.splats.n_active) > 48
