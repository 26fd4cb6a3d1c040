"""Headless render throughput benchmark (the reference's >=100 FPS @1080p
viewer headline). Prints one JSON line like bench.py."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lichtfeld_studio_tpu.core.camera import CameraParams, look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.ops.rasterize import rasterize

    W, H = 1920, 1080
    N = 660_000
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
    mode = "pallas" if jax.default_backend() in ("tpu", "axon") else "tiles"
    cams = []
    cam_objs = []
    for k in range(8):
        th = 2 * np.pi * k / 8
        c = look_at_camera(8.0 * np.array([np.sin(th), -0.1, -np.cos(th)]), np.zeros(3),
                           np.array([0.0, -1.0, 0.0]), 1500.0, 1500.0, W, H)
        cam_objs.append(c)
        cams.append((jnp.asarray(c.w2c), jnp.asarray(c.cam_position)))
    # probe-snug instance cap: the same projection-only probe + snug bucket
    # the production headless renderer uses (render_view) — every binning/
    # gather/blend stage scales with the STATIC cap, so the old fixed 2^21
    # cap taxed each frame ~20% over the true 1.72M peak
    from lichtfeld_studio_tpu.ops.rasterize import count_instances

    probe = jax.jit(count_instances, static_argnames=("tile_size",))
    peak = max(
        int(probe(sd, c.device_params(), tile_size=32)) for c in cam_objs
    )
    cap = -(-int(peak * 1.04) // 128) * 128
    print(f"peak instances over orbit: {peak} -> cap {cap}", file=sys.stderr)
    f = jax.jit(lambda s, w2c, cp: rasterize(
        s, CameraParams(w2c=w2c, cam_position=cp,
                        K=jnp.asarray([1500.0, 1500.0, W / 2, H / 2], jnp.float32),
                        uid=jnp.asarray(0, jnp.int32), width=W, height=H),
        jnp.zeros(3), mode=mode, instance_cap=cap, inference=True))
    out = f(sd, *cams[0]); _ = float(out.image.ravel()[0])
    n_inst = int(out.n_instances)
    print(f"instances (view 0): {n_inst}", file=sys.stderr)
    assert n_inst <= cap, "instance cap overflow — bench frame is lossy"
    n_frames = 20
    t0 = time.time()
    for k in range(n_frames):
        out = f(sd, *cams[k % 8])
    _ = float(out.image.ravel()[0])
    fps = n_frames / (time.time() - t0)
    print(json.dumps({
        "metric": "headless_render_fps_1080p_660k",
        "value": round(fps, 2), "unit": "FPS", "vs_baseline": round(fps / 100.0, 4),
    }))

    # --- interactive path: frame-coherent renderer on a slow inspection
    # drag (the regime where binning reuse pays — measured: dilation
    # inflates gather+blend ~8%/px while re-binning costs only ~9 ms of a
    # 34 ms frame, so fast drags correctly fall back to per-frame re-bins).
    # Orbit: ~0.4 px/frame projected drift (hover-and-inspect speed).
    from lichtfeld_studio_tpu.render.coherent import CoherentRenderer

    r = CoherentRenderer(W, H, tile_size=32, instance_cap=2_097_152)
    orbit = [
        look_at_camera(8.0 * np.array([np.sin(t), -0.1, -np.cos(t)]), np.zeros(3),
                       np.array([0.0, -1.0, 0.0]), 1500.0, 1500.0, W, H)
        for t in np.linspace(0.0, 0.004, 32)
    ]
    img = r.render(sd, orbit[0], as_numpy=False)  # warmup (bin + frame compile)
    _ = float(img.ravel()[0])
    n_coh = 30
    t0 = time.time()
    for k in range(n_coh):
        img = r.render(sd, orbit[1 + k], as_numpy=False)
    _ = float(img.ravel()[0])
    dt = time.time() - t0
    fps_coh = n_coh / dt
    print(f"coherent orbit: {fps_coh:.1f} FPS ({r.stats['bins']} bins / "
          f"{r.stats['frames']} frames)", file=sys.stderr)
    print(json.dumps({
        "metric": "interactive_render_fps_1080p_660k_coherent",
        "value": round(fps_coh, 2), "unit": "FPS",
        "vs_baseline": round(fps_coh / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
