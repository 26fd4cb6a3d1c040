"""Measure what the exact per-tile overlap test buys at bench geometry:
true instance totals with the exact test (sum n_touched) vs conservative
bbox-only (sum area). Decides whether the [C, 32] _will_contribute pass
pays for itself at 32px tiles."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lichtfeld_studio_tpu.core.camera import look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.ops.projection import project_gaussians

    W, H = 1296, 840
    CAP = 1_000_000
    N0 = 600_000
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

    for ts in (16, 32):
        @jax.jit
        def stats(s):
            proj = project_gaussians(
                s.means, s.scaling, s.rotation, s.opacity, s.sh0, s.shN,
                s.active_mask(), s.active_sh_degree,
                cam.w2c, cam.cam_position, cam.K,
                width=W, height=H, tile_size=ts,
            )
            bb = proj.bbox
            area = jnp.where(proj.valid, (bb[:, 1] - bb[:, 0]) * (bb[:, 3] - bb[:, 2]), 0)
            hist = jnp.array([
                jnp.sum((area > 0) & (area <= 4)),
                jnp.sum((area > 4) & (area <= 16)),
                jnp.sum((area > 16) & (area <= 32)),
                jnp.sum(area > 32),
            ])
            return jnp.sum(proj.n_touched), jnp.sum(area), hist

        exact, cons, hist = jax.tree_util.tree_map(np.asarray, stats(splats))
        print(f"tile {ts:2d}px: exact={int(exact):,} conservative={int(cons):,} "
              f"inflation={(int(cons)/max(int(exact),1) - 1)*100:.1f}%  "
              f"area histogram (<=4, <=16, <=32, >32): {hist.tolist()}")


if __name__ == "__main__":
    main()
