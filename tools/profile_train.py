"""Honest phase-level profile of the train step at bench geometry.

All timings force a one-element host readback (block_until_ready does not
fence on this backend). Phases: projection fwd, binning, pack+blend fwd,
full fwd loss, full fwd+bwd, optimizer apply.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def force(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0])


def timeit(f, *args, n=10, label=""):
    out = f(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    force(out)
    dt = (time.time() - t0) / n
    print(f"{label:44s} {dt*1000:8.1f} ms", flush=True)
    return out, dt


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lichtfeld_studio_tpu.core.camera import look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.kernels.blend_pallas import CHUNK, blend_pallas_fused
    from lichtfeld_studio_tpu.ops.projection import project_gaussians
    from lichtfeld_studio_tpu.ops.rasterize import rasterize
    from lichtfeld_studio_tpu.ops.ssim import ssim
    from lichtfeld_studio_tpu.ops.tiles import build_tile_assignment, pack_features_t
    from lichtfeld_studio_tpu.train.state import TrainConfig, StepFlags, init_train_state, make_lrs, train_step
    from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig

    W, H = 1296, 840
    TS = int(os.environ.get("LFS_BENCH_TS", 32))
    GW, GH = -(-W // TS), -(-H // TS)
    CAP = 1_000_000
    N0 = 600_000
    ICAP = int(os.environ.get("LFS_BENCH_ICAP", 1_500_000))
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

    proj_f = jax.jit(lambda s: project_gaussians(
        s.means, s.scaling, s.rotation, s.opacity, s.sh0, s.shN,
        s.active_mask(), s.active_sh_degree, cam.w2c, cam.cam_position, cam.K,
        width=W, height=H, tile_size=TS))
    proj, t_proj = timeit(proj_f, splats, label="projection fwd (EWA + SH3)")

    bin_f = jax.jit(lambda p: build_tile_assignment(
        p, grid_w=GW, grid_h=GH, instance_cap=ICAP, chunk_align=1))
    assign, t_bin = timeit(bin_f, proj, label="binning (train layout)")
    print(f"  n_instances = {int(assign.n_instances)}")

    import functools
    blend_f = jax.jit(lambda p, a: blend_pallas_fused(
        pack_features_t(p, False), a, p.n_touched,
        grid_w=GW, grid_h=GH, tile_size=TS, n_channels=3)[0])
    _, t_blend = timeit(blend_f, proj, assign, label="pack + blend fwd")

    def fwd_loss(s):
        out = rasterize(s, cam, bg, mode="pallas", instance_cap=ICAP, tile_size=TS)
        img = jnp.clip(out.image, 0.0, 1.0)
        l1 = jnp.mean(jnp.abs(img - gt))
        s_v = ssim(img, gt)
        return 0.8 * l1 + 0.2 * (1.0 - s_v)

    import dataclasses

    def fwd_loss_p(params):
        s = dataclasses.replace(splats, **params)
        return fwd_loss(s)

    params0 = dict(
        means=splats.means, scaling=splats.scaling, rotation=splats.rotation,
        opacity=splats.opacity, sh0=splats.sh0, shN=splats.shN,
    )
    _, t_fwd = timeit(jax.jit(fwd_loss_p), params0, label="full fwd (raster + L1 + SSIM)")

    grad_f = jax.jit(lambda p: jax.grad(fwd_loss_p)(p)["means"])
    _, t_bwd = timeit(grad_f, params0, label="full fwd+bwd (grad wrt splats)")

    cfg = TrainConfig(
        iterations=30_000, raster_mode="pallas", instance_cap=ICAP, k_max=1024,
        tile_size=TS,
        mcmc=MCMCConfig(max_cap=CAP, start_refine=5, stop_refine=1000, refine_every=10),
        lr_gamma=0.01 ** (1.0 / 30_000),
    )
    lrs = make_lrs(1.6e-5, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    state = init_train_state(splats, lrs, seed=0)
    step_f = jax.jit(
        lambda st: train_step(st, cam, gt, bg, cfg, StepFlags())[1]["loss"]
    )
    _, t_step = timeit(step_f, state, label="full train step (no donation)")

    print(f"\n  fwd-only remainder (fwd - proj - bin - blend): "
          f"{(t_fwd - t_proj - t_bin - t_blend)*1000:.1f} ms (SSIM/L1/composite)")
    print(f"  bwd cost (fwd+bwd - fwd): {(t_bwd - t_fwd)*1000:.1f} ms")
    print(f"  optimizer/MCMC remainder (step - fwd+bwd): {(t_step - t_bwd)*1000:.1f} ms")


if __name__ == "__main__":
    main()
