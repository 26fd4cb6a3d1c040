"""Compile-time audit: wall-time jax trace/lower/compile for each stage of
the train step at bench geometry, persistent cache DISABLED, so the true
cold-compile cost and its distribution across subsystems is visible.

BENCH_r03 recorded 346 s for compile+first-dispatch of the scanned step vs
93 s in r02 — this tool answers where that time lives (XLA vs Mosaic, which
stage) and what a mitigation must target.

Usage: python tools/compile_audit.py [stage ...]
  stages: proj bin blendf blendg step scan   (default: all but scan)
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp

    from lichtfeld_studio_tpu.core.camera import CameraParams, look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.kernels.blend_pallas import blend_pallas_fused
    from lichtfeld_studio_tpu.ops.projection import project_gaussians
    from lichtfeld_studio_tpu.ops.tiles import build_tile_assignment, pack_features_t
    from lichtfeld_studio_tpu.train.state import (
        StepFlags,
        TrainConfig,
        init_train_state,
        make_lrs,
    )
    from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig

    W, H = 1296, 840
    TS = 32
    CAP = 1_000_000
    N0 = 600_000
    ICAP = 1_500_000
    grid_w, grid_h = -(-W // TS), -(-H // TS)
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

    def audit(label, fn, *args):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        try:
            n_ops = compiled.as_text().count("\n")
        except Exception:
            n_ops = -1
        print(f"{label:12s} trace+lower {t1-t0:7.1f}s   compile {t2-t1:7.1f}s"
              f"   (hlo lines ~{n_ops})", flush=True)
        return compiled

    stages = sys.argv[1:] or ["proj", "bin", "blendf", "blendg", "step"]

    def proj_fn(s):
        return project_gaussians(
            s.means, s.scaling, s.rotation, s.opacity, s.sh0, s.shN,
            s.active_mask(), s.active_sh_degree, cam.w2c, cam.cam_position,
            cam.K, width=W, height=H, tile_size=TS, exact_tile_cap=16,
        )

    def bin_fn(s):
        proj = proj_fn(s)
        return build_tile_assignment(
            proj, grid_w=grid_w, grid_h=grid_h, instance_cap=ICAP,
            chunk_align=1, need_grad=True,
        )

    def fwd_fn(s):
        proj = proj_fn(s)
        asg = build_tile_assignment(
            proj, grid_w=grid_w, grid_h=grid_h, instance_cap=ICAP,
            chunk_align=1, need_grad=True,
        )
        img, alpha = blend_pallas_fused(
            pack_features_t(proj), asg, proj.n_touched,
            grid_w=grid_w, grid_h=grid_h, tile_size=TS,
        )
        return img

    def grad_fn(s):
        def loss(ms):
            img = fwd_fn(s.replace_trainable({**s.trainable_dict(), "means": ms}))
            return jnp.sum(img * img)
        return jax.grad(loss)(s.means)

    if "proj" in stages:
        audit("proj", proj_fn, splats)
    if "bin" in stages:
        audit("proj+bin", bin_fn, splats)
    if "blendf" in stages:
        audit("fwd chain", fwd_fn, splats)
    if "blendg" in stages:
        audit("grad chain", grad_fn, splats)

    if "step" in stages or "scan" in stages:
        cfg = TrainConfig(
            iterations=30_000, raster_mode="pallas", instance_cap=ICAP,
            k_max=1024, tile_size=TS,
            mcmc=MCMCConfig(max_cap=CAP, start_refine=5, stop_refine=1000, refine_every=10),
            lr_gamma=0.01 ** (1.0 / 30_000),
        )
        lrs = make_lrs(1.6e-5, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
        state = init_train_state(splats, lrs, seed=0)
        plain = StepFlags()
        if "step" in stages:
            from lichtfeld_studio_tpu.train.state import train_step

            def step_fn(st):
                return train_step(st, cam, gt, bg, cfg, plain)

            audit("train_step", step_fn, state)
        if "scan" in stages:
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

            def scan_fn(st):
                return train_steps_scanned(st, stacked_cam, gts, bg, cfg, plain)

            audit("scan10", scan_fn, state)


if __name__ == "__main__":
    main()
