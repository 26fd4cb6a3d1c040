"""Early-termination effectiveness at bench geometry: per-tile walked vs
total chunks (read from the forward kernel's free diagnostic rows 5/6).

The blend's cost is walked-chunk count x per-chunk wall (PERFNOTES); this
prints the distribution that says how much headroom finer-grained
termination (sub-tile blocks) or chunk skipping could unlock.
"""

import os
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lichtfeld_studio_tpu.core.camera import look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.kernels.blend_pallas import _blend_gathered_fwd
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

    # splats/cam as jit ARGS (closed-over arrays constant-fold the whole
    # binning on the compile host: 158 MB executables, minutes of compile —
    # PERFNOTES r4 compile-time section)
    @jax.jit
    def run(splats, cam):
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
        out, _ = _blend_gathered_fwd(
            pack_features_t(proj), assignment.gaussian_idx,
            assignment.slot_layout, assignment.instance_valid, proj.n_touched,
            (assignment.tile_start, assignment.tile_count),
            grid_w, grid_h, TS, assignment.source_cap, assignment.chunk,
        )
        # dead-chunk upper bound: instances binned through the CONSERVATIVE
        # bbox path (footprint > exact_tile_cap cells) are the only ones that
        # can contribute NOTHING to their tile — everything else passed the
        # exact per-tile contribution test (ops/projection.py:208-237), so a
        # chunk of exact-tested instances can never be fully dead.
        conservative = jnp.sum(
            jnp.where(proj.valid & (proj.tile_mask == 0), proj.n_touched, 0)
        )
        return (out[:, 5, :], out[:, 6, 0], out[:, 7, :], conservative,
                jnp.sum(proj.n_touched))

    row5, total, contrib, n_cons, n_inst = jax.block_until_ready(run(splats, cam))
    row5 = np.asarray(row5)  # broadcast walked count, or per-pixel saturation
    #   steps under LFS_BLEND_PIXEL_DIAG=1
    walked = row5.max(axis=1)
    total = np.asarray(total)
    contrib = np.asarray(contrib)  # [T, P] lane ci = chunk ci contribution bound
    live = total > 0
    w, t = walked[live], total[live]
    print(f"tiles: {live.sum()} live / {total.size}")
    print(f"chunks: walked {w.sum():.0f} / total {t.sum():.0f} "
          f"({100 * w.sum() / t.sum():.1f}% walked)")
    print(f"per-tile walked: mean {w.mean():.2f}  p50 {np.percentile(w, 50):.0f}"
          f"  p90 {np.percentile(w, 90):.0f}  max {w.max():.0f}")
    print(f"per-tile total:  mean {t.mean():.2f}  p50 {np.percentile(t, 50):.0f}"
          f"  p90 {np.percentile(t, 90):.0f}  max {t.max():.0f}")
    print(f"conservatively-binned instances (dead-chunk upper bound): "
          f"{int(n_cons)} / {int(n_inst)} ({100 * int(n_cons) / max(int(n_inst), 1):.2f}%)")
    # backward tail-trim opportunity (GRAD_SKIP_EPS): chunks the backward
    # would walk = per tile 1 + last lane with contrib >= eps (>= 1 floor),
    # vs the current replay = `walked`.
    if os.environ.get("LFS_BLEND_PIXEL_DIAG") == "1":
        # row 5 holds per-PIXEL saturation steps: how many chunk-EQUIVALENTS
        # of vector work would a sub-tile pixel-block early termination walk?
        # A block of 1/B of the tile's pixels walking w chunks costs w/B
        # full-chunk equivalents (the loop/DMA skeleton still runs
        # max-over-blocks steps per tile — unchanged, = `walked`).
        p = row5.shape[1]
        base = walked[live].sum()
        for nblk in (2, 4, 8):
            bw = row5[live].reshape(live.sum(), nblk, p // nblk).max(axis=2)
            eq = bw.sum() / nblk
            print(f"{nblk} pixel blocks: {eq:.0f} chunk-equivalents of "
                  f"vector work ({100 * eq / base:.1f}% of tile-level walk)")
    lanes = np.arange(contrib.shape[1])[None, :]
    for eps in (1e-4, 1e-3, 1.0 / 255.0, 1e-2):
        n_eff = np.maximum((lanes + 1) * (contrib >= eps), 0).max(axis=1)
        n_eff = np.minimum(np.maximum(n_eff, 1), total)[live]
        mid_skip = ((contrib[live] < eps) & (lanes < n_eff[:, None])).sum()
        print(f"eps={eps:.4g}: bwd walks {n_eff.sum():.0f} chunks "
              f"({100 * n_eff.sum() / w.sum():.1f}% of fwd walk); "
              f"mid-walk sub-eps chunks (checkpoint-skip headroom): {mid_skip}")


if __name__ == "__main__":
    main()
