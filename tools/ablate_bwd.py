"""Attribution of the BACKWARD blend kernel's per-chunk wall (the single
biggest step item, ~27 ms at bench geometry): monkeypatch each candidate
cost source to a cheap surrogate and time jax.grad of a scalar loss.

Surrogates change values, not shapes/masks, so the measured delta is the
cost of the patched computation (plus anything XLA can newly DCE behind it).
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

    import lichtfeld_studio_tpu.kernels.blend_pallas as bp
    from lichtfeld_studio_tpu.core.camera import look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
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

    def run(label):
        def loss(p, asg, nt):
            img, alpha = bp.blend_pallas_fused(
                p, asg, nt, grid_w=grid_w, grid_h=grid_h, tile_size=TS,
            )
            return jnp.sum(img * img) + jnp.sum(alpha)

        f = jax.jit(jax.grad(loss))

        @jax.jit
        def probe(x):
            return x.ravel()[0]

        g = f(packed_t, assignment, n_touched)
        float(probe(g))
        t0 = time.perf_counter()
        for _ in range(10):
            g = f(packed_t, assignment, n_touched)
        float(probe(g))
        dt = (time.perf_counter() - t0) / 10
        print(f"{label:40s} {dt*1000:8.2f} ms", flush=True)

    orig_dot3 = bp._dot3
    orig_sumscan = bp._prefix_sum_rows
    orig_prodscan = bp._prefix_prod_rows

    run("A baseline fwd+bwd")

    # B: mom matmul 3-pass -> 1 default-precision pass (bf16 MXU)
    def dot3_default(a, b, dims):
        import functools as ft
        return jax.lax.dot_general(
            a, b, dimension_numbers=dims, preferred_element_type=jnp.float32,
        )

    bp._dot3 = dot3_default
    run("B mom+sigma2grad matmuls 3-pass -> 1")
    bp._dot3 = orig_dot3

    # C: mom matmul removed entirely (zeros surrogate; XLA may DCE the u
    # chain behind it in the bwd kernel — interpret the delta as an UPPER
    # bound on the mom matmul's cost)
    def dot3_zero(a, b, dims):
        m = a.shape[0]
        n = b.shape[0] if dims[0][0][0] == 1 else b.shape[1]
        return jnp.zeros((m, n), jnp.float32)

    bp._dot3 = dot3_zero
    run("C mom matmul -> zeros (upper bound)")
    bp._dot3 = orig_dot3

    # D: wcg prefix sum removed
    bp._prefix_sum_rows = lambda x: x
    run("D no wcg prefix sum")
    bp._prefix_sum_rows = orig_sumscan

    # E: both prefix scans removed
    bp._prefix_sum_rows = lambda x: x
    bp._prefix_prod_rows = lambda x: x
    run("E no prefix scans at all")
    bp._prefix_sum_rows = orig_sumscan
    bp._prefix_prod_rows = orig_prodscan


if __name__ == "__main__":
    main()
