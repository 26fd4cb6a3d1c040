"""Phase-level profile of the headless render path (1080p, 660k gaussians).

Times projection / binning / pack+blend separately to find the FPS
bottleneck before building the inference-specialized path.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _force(out):
    """On the axon backend jax.block_until_ready does NOT block — a host
    readback of one element is the only reliable fence."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def timeit(f, *args, n=10, label=""):
    out = f(*args)
    _force(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _force(out)
    dt = (time.time() - t0) / n
    print(f"{label:36s} {dt*1000:8.1f} ms", flush=True)
    return out, dt


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from functools import partial

    from lichtfeld_studio_tpu.core.camera import CameraParams, look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.ops.projection import project_gaussians
    from lichtfeld_studio_tpu.ops.tiles import build_tile_assignment, pack_features_t
    from lichtfeld_studio_tpu.kernels.blend_pallas import CHUNK, blend_pallas_fused

    W, H = 1920, 1080
    TS = 16
    GW, GH = -(-W // TS), -(-H // TS)
    N = 660_000
    ICAP = 2_500_000
    rng = np.random.default_rng(0)
    pos = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    col = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    sd = SplatData(
        means=jnp.asarray(pos), sh0=jnp.asarray(((col - 0.5) / 0.2821)[:, None, :]),
        shN=jnp.zeros((N, 15, 3)), scaling=jnp.full((N, 3), float(np.log(0.02))),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (N, 1)),
        opacity=jnp.full((N, 1), 0.0),
        n_active=jnp.asarray(N, jnp.int32), active_sh_degree=jnp.asarray(3, jnp.int32),
        max_sh_degree=3, scene_scale=3.0,
    )
    c = look_at_camera(8.0 * np.array([0.0, -0.1, -1.0]), np.zeros(3),
                       np.array([0.0, -1.0, 0.0]), 1500.0, 1500.0, W, H)
    w2c = jnp.asarray(c.w2c)
    cpos = jnp.asarray(c.cam_position)
    K = jnp.asarray([1500.0, 1500.0, W / 2, H / 2], jnp.float32)

    proj_f = jax.jit(lambda s: project_gaussians(
        s.means, s.scaling, s.rotation, s.opacity, s.sh0, s.shN,
        s.active_mask(), s.active_sh_degree, w2c, cpos, K,
        width=W, height=H, tile_size=TS))
    proj, t_proj = timeit(proj_f, sd, label="projection (EWA + SH deg3)")

    bin_f = jax.jit(lambda p: build_tile_assignment(
        p, grid_w=GW, grid_h=GH, instance_cap=ICAP, chunk_align=CHUNK))
    assign, t_bin = timeit(bin_f, proj, label=f"binning (cap {ICAP/1e6:.1f}M)")
    print(f"  n_instances = {int(assign.n_instances)}")

    pack_f = jax.jit(lambda p: pack_features_t(p, False))
    packed, t_pack = timeit(pack_f, proj, label="pack_features")

    blend_f = jax.jit(partial(
        blend_pallas_fused, grid_w=GW, grid_h=GH, tile_size=TS, n_channels=3))
    _, t_blend = timeit(blend_f, packed, assign, proj.n_touched, label="pallas blend fwd")

    total = t_proj + t_bin + t_pack + t_blend
    print(f"{'TOTAL (phase sum)':36s} {total*1000:8.1f} ms -> {1/total:.1f} FPS")

    inf_f = jax.jit(lambda p: build_tile_assignment(
        p, grid_w=GW, grid_h=GH, instance_cap=ICAP, chunk_align=CHUNK,
        need_grad=False))
    assign_i, t_bin_i = timeit(inf_f, proj, label=f"binning inference (cap {ICAP/1e6:.1f}M)")
    total_i = t_proj + t_bin_i + t_pack + t_blend
    print(f"{'TOTAL (inference bin)':36s} {total_i*1000:8.1f} ms -> {1/total_i:.1f} FPS")

    # tighter instance cap
    icap2 = 1 << 20
    bin_f2 = jax.jit(lambda p: build_tile_assignment(
        p, grid_w=GW, grid_h=GH, instance_cap=icap2, chunk_align=CHUNK))
    assign2, t_bin2 = timeit(bin_f2, proj, label=f"binning (cap {icap2/1e6:.1f}M)")
    _, t_blend2 = timeit(blend_f, packed, assign2, proj.n_touched, label="pallas blend fwd (1M cap)")
    total2 = t_proj + t_bin2 + t_pack + t_blend2
    print(f"{'TOTAL (1M cap)':36s} {total2*1000:8.1f} ms -> {1/total2:.1f} FPS")


if __name__ == "__main__":
    main()
