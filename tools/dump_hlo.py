"""Dump optimized HLO of the train step; print summary lines for named ops
(fusion.N / sort.N) so trace entries can be mapped to source operations."""

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")),
    )
    import jax.numpy as jnp

    from lichtfeld_studio_tpu.core.camera import look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.train.state import (
        StepFlags, TrainConfig, init_train_state, make_lrs, train_step,
    )
    from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig

    W, H = 1296, 840
    CAP = 1_000_000
    N0 = 600_000
    ICAP = int(os.environ.get('LFS_BENCH_ICAP', 1_500_000))
    TS = int(os.environ.get('LFS_BENCH_TS', 32))
    rng = np.random.default_rng(0)
    splats = SplatData(
        means=jnp.zeros((CAP, 3)),
        sh0=jnp.zeros((CAP, 1, 3)),
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
    gt = jnp.zeros((H, W, 3))
    bg = jnp.zeros(3)

    cfg = TrainConfig(
        iterations=30_000, raster_mode="pallas", instance_cap=ICAP, k_max=1024, tile_size=TS,
        mcmc=MCMCConfig(max_cap=CAP, start_refine=5, stop_refine=1000, refine_every=10),
        lr_gamma=0.01 ** (1.0 / 30_000),
    )
    lrs = make_lrs(1.6e-5, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    state = init_train_state(splats, lrs, seed=0)

    from lichtfeld_studio_tpu.core.camera import CameraParams
    from lichtfeld_studio_tpu.train.state import train_steps_scanned
    K_SCAN = 10
    stacked_cam = CameraParams(
        w2c=jnp.tile(cam.w2c[None], (K_SCAN, 1, 1)),
        cam_position=jnp.tile(cam.cam_position[None], (K_SCAN, 1)),
        K=jnp.tile(cam.K[None], (K_SCAN, 1)),
        uid=jnp.zeros((K_SCAN,), jnp.int32),
        width=W, height=H,
    )
    gts = jnp.tile(gt[None], (K_SCAN, 1, 1, 1))
    f = jax.jit(train_steps_scanned, static_argnums=(4, 5))
    compiled = f.lower(state, stacked_cam, gts, bg, cfg, StepFlags()).compile()
    txt = compiled.as_text()
    Path("/tmp/step_hlo.txt").write_text(txt)
    print(f"HLO written to /tmp/step_hlo.txt ({len(txt)} chars)")

    # print the definition line of each top-level named op
    want = sys.argv[1:] if len(sys.argv) > 1 else []
    pat = re.compile(r"^\s*%?((?:fusion|sort|transpose_jvp\S*|jvp\S*|while|copy|reshape|gather|scatter|concatenate|pad)[.\w]*) = (.*)$")
    for line in txt.splitlines():
        m = pat.match(line)
        if m:
            name, rest = m.groups()
            if want and name not in want:
                continue
            print(f"{name:28s} {rest[:180]}")


if __name__ == "__main__":
    main()
