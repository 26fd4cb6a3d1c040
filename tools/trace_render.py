"""Trace the inference render step; dump top device ops."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
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
    f = jax.jit(lambda s, w2c, cp: rasterize(
        s, CameraParams(w2c=w2c, cam_position=cp,
                        K=jnp.asarray([1500.0, 1500.0, W / 2, H / 2], jnp.float32),
                        uid=jnp.asarray(0, jnp.int32), width=W, height=H),
        jnp.zeros(3), mode="pallas", instance_cap=2_097_152, inference=True).image)
    c = look_at_camera(8.0 * np.array([np.sin(0.3), -0.1, -np.cos(0.3)]), np.zeros(3),
                       np.array([0.0, -1.0, 0.0]), 1500.0, 1500.0, W, H)
    args = (jnp.asarray(c.w2c), jnp.asarray(c.cam_position))
    img = f(sd, *args); _ = float(img.ravel()[0])

    outdir = "/tmp/lfs_rtrace"
    import shutil; shutil.rmtree(outdir, ignore_errors=True)
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        img = f(sd, *args)
    _ = float(img.ravel()[0])
    jax.profiler.stop_trace()

    evs = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True), key=os.path.getmtime)
    with gzip.open(evs[-1], "rt") as fh:
        data = json.load(fh)
    tot = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            tot[ev.get("name", "")] += ev["dur"]
    for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur/1000/3:10.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
