"""Training-state checkpoint/resume roundtrip (capability beyond the
reference, which persists only model exports — SURVEY §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from lichtfeld_studio_tpu.train.state import TrainConfig, init_train_state, make_lrs, step_flags, train_step
from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from tests.scene_utils import make_camera, make_random_splats


@pytest.mark.slow
def test_checkpoint_resume_bit_exact(rng, tmp_path):
    splats = make_random_splats(rng, n=24, capacity=48)
    cam = make_camera(32, 32)
    bg = jnp.zeros(3)
    target = rasterize(splats, cam.device_params(), bg, mode="tiles",
                       instance_cap=2048, k_max=64).image
    lrs = make_lrs(1.6e-3, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    cfg = TrainConfig(
        raster_mode="tiles", instance_cap=2048, k_max=64,
        mcmc=MCMCConfig(max_cap=48, start_refine=2, stop_refine=100, refine_every=3),
        lr_gamma=0.999,
    )
    state = init_train_state(splats, lrs, seed=0)
    for i in range(5):
        state, _ = train_step(state, cam.device_params(), target, bg, cfg,
                              step_flags(cfg, i + 1))

    save_checkpoint(state, tmp_path / "ckpt")

    template = init_train_state(splats, lrs, seed=0)
    restored = load_checkpoint(tmp_path / "ckpt", template)
    assert int(restored.iteration) == 5
    np.testing.assert_array_equal(
        np.asarray(restored.splats.means), np.asarray(state.splats.means)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.adam.exp_avg["means"]), np.asarray(state.adam.exp_avg["means"])
    )
    assert float(restored.adam.lr["means"]) == float(state.adam.lr["means"])

    # continued training from the restore matches continued training live
    f6 = step_flags(cfg, 6)
    s_a, _ = train_step(state, cam.device_params(), target, bg, cfg, f6)
    s_b, _ = train_step(restored, cam.device_params(), target, bg, cfg, f6)
    np.testing.assert_array_equal(
        np.asarray(s_a.splats.means), np.asarray(s_b.splats.means)
    )
