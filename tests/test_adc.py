"""ADC (default strategy) tests (parity bar: reference
tests/test_default_strategy.cpp — duplication/split/prune mechanics,
opacity reset, mini training loop)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.ops.adam import init_adam
from lichtfeld_studio_tpu.train.state import TrainConfig, init_train_state, make_lrs, step_flags, train_step
from lichtfeld_studio_tpu.train.strategies import adc
from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from tests.scene_utils import make_camera, make_random_splats


def _cfg(**kw):
    return TrainConfig(
        strategy="default",
        raster_mode="tiles",
        # Pin the reference's 16px tiling: renders are bit-identical across
        # tile sizes, but segmented reductions sum in a different order, and
        # the ~1e-9 grad noise flips ADC's hard grow thresholds — this parity
        # test wants the reference trajectory.
        tile_size=16,
        instance_cap=4096,
        k_max=64,
        scale_reg=0.0,
        opacity_reg=0.0,
        lr_gamma=1.0,
        mcmc=MCMCConfig(
            max_cap=kw.pop("max_cap", 128),
            start_refine=kw.pop("start_refine", 3),
            stop_refine=kw.pop("stop_refine", 1000),
            refine_every=kw.pop("refine_every", 5),
        ),
        **kw,
    )


def _adam_for(splats):
    return init_adam(splats.trainable_dict(), {k: 0.01 for k in splats.trainable_dict()})


def test_grow_duplicates_small_and_splits_large(rng):
    n = 16
    splats = make_random_splats(rng, n=n, capacity=64)
    # gaussians 0-3 small, 4-7 large; all with high grads
    scaling = np.full((64, 3), -10.0, np.float32)
    scaling[:4] = np.log(0.001 * splats.scene_scale)
    scaling[4:8] = np.log(1.0 * splats.scene_scale)
    scaling[8:n] = np.log(0.001 * splats.scene_scale)
    splats = splats.replace_trainable(
        {**splats.trainable_dict(), "scaling": jnp.asarray(scaling)}
    )
    cfg = _cfg()
    count = jnp.ones(64)
    grad = jnp.zeros(64).at[:8].set(1.0)  # gaussians 0-7 above threshold
    new_splats, _ = adc.grow_gs(
        jax.random.PRNGKey(0), splats, _adam_for(splats), count, grad, cfg
    )
    # 4 duplicated + 4 split (each +1 net) = 16 + 8
    assert int(new_splats.n_active) == n + 8
    # split originals got scale/1.6
    s_new = np.asarray(new_splats.get_scaling()[4:8])
    np.testing.assert_allclose(s_new, 1.0 * splats.scene_scale / 1.6, rtol=1e-4)


def test_prune_compacts_prefix(rng):
    n = 24
    splats = make_random_splats(rng, n=n, capacity=32)
    op = np.array(splats.opacity)
    op[3] = -15.0  # kill
    op[10] = -15.0
    splats = splats.replace_trainable(
        {**splats.trainable_dict(), "opacity": jnp.asarray(op)}
    )
    cfg = _cfg()
    new_splats, new_adam = adc.prune_gs(jnp.asarray(100), splats, _adam_for(splats), cfg)
    assert int(new_splats.n_active) == n - 2
    kept = np.asarray(new_splats.means[: n - 2])
    orig = np.asarray(splats.means[:n])
    expect = np.delete(orig, [3, 10], axis=0)
    np.testing.assert_allclose(kept, expect, atol=1e-6)


def test_reset_opacity_clamps(rng):
    splats = make_random_splats(rng, n=8, opacity_range=(0.5, 0.9))
    cfg = _cfg()
    new_splats, new_adam = adc.reset_opacity(splats, _adam_for(splats), cfg)
    op = np.asarray(jax.nn.sigmoid(new_splats.opacity[:8, 0]))
    assert np.all(op <= 2.0 * cfg.prune_opacity + 1e-6)
    assert float(jnp.abs(new_adam.exp_avg["opacity"]).max()) == 0.0


@pytest.mark.slow
def test_adc_training_smoke(rng):
    gt_splats = make_random_splats(rng, n=32, capacity=128)
    cam = make_camera(48, 32)
    bg = jnp.zeros(3)
    target = rasterize(
        gt_splats, cam.device_params(), bg, mode="tiles", instance_cap=4096, k_max=64
    ).image

    noisy = gt_splats.replace_trainable(
        {
            **gt_splats.trainable_dict(),
            "means": gt_splats.means
            + 0.05 * jnp.asarray(rng.normal(0, 1, gt_splats.means.shape).astype(np.float32)),
        }
    )
    lrs = make_lrs(1.6e-3, 2.5e-3, 5e-3, 1e-3, 0.05, noisy.scene_scale)
    state = init_train_state(noisy, lrs, seed=0)
    cfg = _cfg(start_refine=5, refine_every=10, reset_every=10_000)
    losses = []
    for i in range(40):
        state, metrics = train_step(
            state, cam.device_params(), target, bg, cfg, step_flags(cfg, i + 1)
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # growth events spike the loss; compare settled windows, not endpoints
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert int(state.splats.n_active) >= 32  # growth may trigger
    # densify stats accumulated and finite
    assert np.isfinite(np.asarray(state.densify_grad)).all()


def test_adc_reset_gated_by_stop_refine():
    """Opacity resets must stop at stop_refine like the reference
    (default_strategy.cpp:304-318 returns before the reset once
    iter >= stop_refine). A reset on/after stop_refine never recovers —
    the 30k protocol measured a 29 -> 11 dB collapse from a reset landing
    on the final step."""
    from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig

    cfg = TrainConfig(
        strategy="default", reset_every=3000, iterations=30_000,
        mcmc=MCMCConfig(start_refine=500, stop_refine=27_000, refine_every=100),
    )
    assert step_flags(cfg, 3000).reset
    assert step_flags(cfg, 24_000).reset
    assert not step_flags(cfg, 27_000).reset  # iter >= stop_refine
    assert not step_flags(cfg, 30_000).reset
