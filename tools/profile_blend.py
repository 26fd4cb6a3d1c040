"""Isolated timing of the Pallas blend fwd / fwd+bwd at bench geometry.

Builds one real projection+binning at the bench scene (1M cap, 1296x840,
TS=32, compact layout), freezes the assignment, and times just
blend_pallas_fused and its VJP with forced readbacks — the fast iteration
loop for kernel work (full bench.py recompiles the whole train step).
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
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lichtfeld_studio_tpu.core.camera import look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.kernels.blend_pallas import blend_pallas_fused
    from lichtfeld_studio_tpu.ops.projection import project_gaussians
    from lichtfeld_studio_tpu.ops.tiles import build_tile_assignment, pack_features_t

    W, H = 1296, 840
    TS = int(os.environ.get("LFS_BENCH_TS", 32))
    CAP = 1_000_000
    N0 = 600_000
    ICAP = int(os.environ.get("LFS_BENCH_ICAP", 1_500_000))
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

    # splats/cam as jit ARGS, not closures (closure form constant-folds the
    # whole binning on the compile host: 158 MB executables, minutes of
    # compile — PERFNOTES r4 compile-time section)
    @jax.jit
    def prep(splats, cam):
        proj = project_gaussians(
            splats.means, splats.scaling, splats.rotation, splats.opacity,
            splats.sh0, splats.shN, splats.active_mask(), splats.active_sh_degree,
            cam.w2c, cam.cam_position, cam.K,
            width=W, height=H, tile_size=TS, exact_tile_cap=16,
        )
        assignment = build_tile_assignment(
            proj, grid_w=grid_w, grid_h=grid_h, instance_cap=ICAP,
            chunk_align=1, need_grad=True,
        )
        return pack_features_t(proj), assignment, proj.n_touched

    packed_t, assignment, n_touched = jax.block_until_ready(prep(splats, cam))
    print("n_instances:", int(assignment.n_instances), flush=True)

    EXACT = os.environ.get("LFS_PROF_EXACT", "1") == "1"
    FREEZE = os.environ.get("LFS_PROF_FREEZE", "1") == "1"

    def fwd(p, asg, nt):
        img, alpha = blend_pallas_fused(
            p, asg, nt, grid_w=grid_w, grid_h=grid_h, tile_size=TS,
            exact_alpha=EXACT, freeze=FREEZE,
        )
        return img, alpha

    def loss(p, asg, nt):
        img, alpha = fwd(p, asg, nt)
        return jnp.sum(img * img) + jnp.sum(alpha)

    f_fwd = jax.jit(fwd)
    f_grad = jax.jit(jax.grad(loss))

    @jax.jit
    def _probe(x):
        return jax.tree_util.tree_leaves(x)[0].ravel()[0]

    def force(x):
        # one-element readback: jax.block_until_ready does not fence on this
        # backend (PERFNOTES), and a full-leaf np.asarray would drag ~13 MB
        # through the tunnel per call
        return float(_probe(x))

    def timeit(f, label, n=20):
        out = f(packed_t, assignment, n_touched)
        force(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(packed_t, assignment, n_touched)
        force(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:24s} {dt*1000:8.2f} ms", flush=True)
        return out

    img, alpha = timeit(f_fwd, "blend fwd")
    g = timeit(f_grad, "blend fwd+bwd")
    print("img mean:", float(jnp.mean(img)), " alpha mean:", float(jnp.mean(alpha)))
    print("grad absmean:", float(jnp.mean(jnp.abs(g))))


if __name__ == "__main__":
    main()
