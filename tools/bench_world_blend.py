"""On-device benchmark of the streaming exact world-space blend (3DGUT
--gut-exact): full train-step throughput and forward FPS at garden scale
through an OpenCV-fisheye camera (the reference's headline 3DGUT use case,
gsplat/RasterizeToPixelsFromWorld3DGSFwd.cu at real resolution).

VERDICT r3/r4 done-criterion: 1296x840 fisheye --gut-exact train step
>= 1 it/s on the chip. Prints stage timings to stderr and one summary line.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser("~/.cache/jax_tpu_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lichtfeld_studio_tpu.core.camera import CameraModelType, look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.train.state import (
        StepFlags, TrainConfig, init_train_state, make_lrs, train_step,
    )
    from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig
    import dataclasses

    W, H = 1296, 840
    CAP = 1_000_000
    N0 = 600_000
    # conservative UT bounds (no exact tile test on the world path) bin more
    # instances than the 2D pipeline at the same scene
    ICAP = int(os.environ.get("LFS_BENCH_ICAP", 1_500_000))
    rng = np.random.default_rng(0)
    pos = rng.uniform(-3, 3, (N0, 3)).astype(np.float32)
    col = rng.uniform(0, 1, (N0, 3)).astype(np.float32)
    splats = SplatData(
        means=jnp.asarray(np.pad(pos, ((0, CAP - N0), (0, 0)))),
        sh0=jnp.asarray(np.pad(((col - 0.5) / 0.2821)[:, None, :],
                               ((0, CAP - N0), (0, 0), (0, 0)))),
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
    cam = dataclasses.replace(
        cam,
        camera_model=CameraModelType.OPENCV_FISHEYE,
        radial=jnp.asarray([0.08, -0.01, 0.0, 0.0], jnp.float32),
    )
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    cfg = TrainConfig(
        iterations=30_000, raster_mode="pallas", instance_cap=ICAP,
        k_max=1024, tile_size=32, projection="ut", gut_exact=True,
        mcmc=MCMCConfig(max_cap=CAP, start_refine=5, stop_refine=1000,
                        refine_every=10),
        lr_gamma=0.01 ** (1.0 / 30_000),
    )
    state = init_train_state(
        splats, make_lrs(1.6e-5, 2.5e-3, 5e-3, 1e-3, 0.05, 3.0), seed=0
    )
    plain = StepFlags()

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    t0 = time.time()
    state, metrics = train_step(state, cam, gt, bg, cfg, plain)
    loss0 = float(metrics["loss"])
    log(f"compile+first dispatch: {time.time()-t0:.1f}s, loss={loss0:.4f}, "
        f"instances={int(metrics['n_instances'])}")
    for _ in range(2):
        state, metrics = train_step(state, cam, gt, bg, cfg, plain)
    _ = float(metrics["loss"])
    t0 = time.time()
    n = 5
    for _ in range(n):
        state, metrics = train_step(state, cam, gt, bg, cfg, plain)
    _ = float(metrics["loss"])
    dt = (time.time() - t0) / n
    log(f"gut-exact train step: {dt*1000:.0f} ms -> {1.0/dt:.2f} it/s")

    # forward-only (inference) frame
    from lichtfeld_studio_tpu.ops.rasterize import rasterize_jit

    img = rasterize_jit(
        state.splats, cam, bg, mode="pallas", instance_cap=ICAP,
        gut_exact=True, inference=True,
    ).image
    _ = float(img.ravel()[0])
    t0 = time.time()
    for _ in range(n):
        img = rasterize_jit(
            state.splats, cam, bg, mode="pallas", instance_cap=ICAP,
            gut_exact=True, inference=True,
        ).image
    _ = float(img.ravel()[0])
    fdt = (time.time() - t0) / n
    log(f"gut-exact forward frame: {fdt*1000:.0f} ms -> {1.0/fdt:.1f} FPS")
    print(
        f'{{"metric": "gut_exact_fisheye_train_step", "value": {1.0/dt:.3f}, '
        f'"unit": "it/s", "forward_fps": {1.0/fdt:.2f}}}'
    )


if __name__ == "__main__":
    main()
