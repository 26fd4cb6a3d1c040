"""Headline benchmark: full MCMC train-step throughput at garden scale.

Synthetic stand-in for the MipNeRF360-garden protocol (no dataset ships in
this environment): 1M-capacity model, ~600k visible gaussians, 1296x840
target (garden at factor 4), full train step = render -> L1+SSIM loss ->
backward -> MCMC post_backward (relocation/growth/noise on schedule) ->
fused Adam -> LR schedule.

Baseline: the reference trains garden/MCMC 30k iters in ~20 min on the
bounty-grade GPU (README.md:50 "below 20 minutes" fused-Adam note,
fused_adam.cpp:12) => ~25 it/s. vs_baseline = ours / 25.

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    import jax

    # big-program XLA compiles take minutes on small hosts; cache them
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import dataclasses

    from lichtfeld_studio_tpu.core.camera import look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.train.state import (
        TrainConfig,
        init_train_state,
        make_lrs,
        train_step,
    )
    from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    W, H = 1296, 840
    CAP = 1_000_000
    N0 = 600_000
    # Instance-buffer capacity: every binning/gather/blend cost scales with
    # the static cap, so size it the way the trainer's snug growth policy
    # would land: observed peak (1.217M exact-counted instances at 32px
    # tiles) x 1.15 headroom, 128-aligned. Overflow is detected/reported.
    ICAP = int(os.environ.get("LFS_BENCH_ICAP", 1_400_000))
    TS = int(os.environ.get("LFS_BENCH_TS", 32))

    rng = np.random.default_rng(0)
    pos = rng.uniform(-3, 3, (N0, 3)).astype(np.float32)
    col = rng.uniform(0, 1, (N0, 3)).astype(np.float32)
    splats = SplatData(
        means=jnp.asarray(np.pad(pos, ((0, CAP - N0), (0, 0)))),
        sh0=jnp.asarray(np.pad(((col - 0.5) / 0.2821)[:, None, :], ((0, CAP - N0), (0, 0), (0, 0)))),
        shN=jnp.zeros((CAP, 15, 3)),
        scaling=jnp.full((CAP, 3), float(np.log(0.02))),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (CAP, 1)),
        opacity=jnp.full((CAP, 1), 0.0),
        n_active=jnp.asarray(N0, jnp.int32),
        active_sh_degree=jnp.asarray(3, jnp.int32),
        max_sh_degree=3,
        scene_scale=3.0,
    )
    cam = look_at_camera(
        np.array([0.0, 0.0, -8.0]), np.zeros(3), np.array([0.0, -1.0, 0.0]),
        fx=1000.0, fy=1000.0, width=W, height=H,
    ).device_params()
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    mode = "pallas" if backend in ("tpu", "axon") else "tiles"
    cfg = TrainConfig(
        iterations=30_000,
        raster_mode=mode,
        tile_size=TS,
        instance_cap=ICAP,
        k_max=1024,
        mcmc=MCMCConfig(max_cap=CAP, start_refine=5, stop_refine=1000, refine_every=10),
        lr_gamma=0.01 ** (1.0 / 30_000),
    )
    lrs = make_lrs(1.6e-5, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    state = init_train_state(splats, lrs, seed=0)

    # production configuration: K plain steps per dispatch via lax.scan
    # (train_steps_scanned); scheduled refine steps run as their own
    # statically-compiled variant — amortized at the real MCMC cadence
    # (refine_every=100, parameter/mcmc_optimization_params.json)
    from lichtfeld_studio_tpu.core.camera import CameraParams
    from lichtfeld_studio_tpu.train.state import StepFlags, train_steps_scanned

    plain = StepFlags()
    refine = StepFlags(refine=True)

    # 25 steps per dispatch: the relay round trip costs ~50 ms per dispatch
    # (measured r5), so K=10 left ~5 ms/step of pure dispatch overhead on
    # the table. The trainer scans up to a full between-events window
    # (refine_every=100), so 25 is conservative vs production behavior.
    K_SCAN = 25
    stacked_cam = CameraParams(
        w2c=jnp.tile(cam.w2c[None], (K_SCAN, 1, 1)),
        cam_position=jnp.tile(cam.cam_position[None], (K_SCAN, 1)),
        K=jnp.tile(cam.K[None], (K_SCAN, 1)),
        uid=jnp.zeros((K_SCAN,), jnp.int32),
        width=W, height=H,
    )
    gts = jnp.tile(gt[None], (K_SCAN, 1, 1, 1))

    t0 = time.time()
    state, metrics = train_steps_scanned(state, stacked_cam, gts, bg, cfg, plain)
    loss0 = float(metrics["loss"][-1])  # forces completion
    log(f"compile+first dispatch ({K_SCAN} steps): {time.time()-t0:.1f}s, "
        f"loss={loss0:.4f}, instances={int(metrics['n_instances'][-1])}")

    warmup, dispatches = 2, 3
    for _ in range(warmup):
        state, metrics = train_steps_scanned(state, stacked_cam, gts, bg, cfg, plain)
    _ = float(metrics["loss"][-1])
    t0 = time.time()
    for _ in range(dispatches):
        state, metrics = train_steps_scanned(state, stacked_cam, gts, bg, cfg, plain)
    _ = float(metrics["loss"][-1])
    t_plain = (time.time() - t0) / (dispatches * K_SCAN)
    log(f"plain step: {t_plain*1000:.0f} ms")

    # refine-variant step cost (compile + 2 warmups, then timed)
    t0 = time.time()
    for _ in range(3):
        state, metrics = train_step(state, cam, gt, bg, cfg, refine)
    _ = float(metrics["loss"])
    log(f"refine compile+warm: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(2):
        state, metrics = train_step(state, cam, gt, bg, cfg, refine)
    _ = float(metrics["loss"])
    t_refine = (time.time() - t0) / 2
    log(f"refine step: {t_refine*1000:.0f} ms (n_active={int(metrics['n_active'])})")

    # amortize at the reference cadence: 1 refine per 100 steps
    t_amort = (99.0 * t_plain + t_refine) / 100.0
    its = 1.0 / t_amort
    log(f"amortized: {t_amort*1000:.0f} ms/step -> {its:.2f} it/s")

    print(json.dumps({
        "metric": "mcmc_train_step_throughput_1Mcap_1296x840",
        "value": round(its, 3),
        "unit": "it/s",
        "vs_baseline": round(its / 25.0, 4),
    }))


if __name__ == "__main__":
    main()
