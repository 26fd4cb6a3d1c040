"""Device-level trace of one inference render frame (1080p, 660k gaussians)
— the per-kernel breakdown behind tools/bench_render.py's FPS number."""

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

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_tpu_cache")
    )
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
        jnp.zeros(3), mode="pallas", instance_cap=2_097_152, inference=True))
    cams = []
    for k in range(8):
        th = 2 * np.pi * k / 8
        c = look_at_camera(8.0 * np.array([np.sin(th), -0.1, -np.cos(th)]), np.zeros(3),
                           np.array([0.0, -1.0, 0.0]), 1500.0, 1500.0, W, H)
        cams.append((jnp.asarray(c.w2c), jnp.asarray(c.cam_position)))
    out = f(sd, *cams[0]); _ = float(out.image.ravel()[0])
    out = f(sd, *cams[1]); _ = float(out.image.ravel()[0])
    print("warm; tracing...", file=sys.stderr, flush=True)

    trace_dir = "/tmp/lfs_rtrace"
    os.system(f"rm -rf {trace_dir}")
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    opts.host_tracer_level = 1
    jax.profiler.start_trace(trace_dir, profiler_options=opts)
    n_frames = 8
    for k in range(n_frames):
        out = f(sd, *cams[k % 8])
    _ = float(out.image.ravel()[0])
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(files[0], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    by_name = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_names.get(e["pid"], ""):
            continue
        dur = e.get("dur", 0) / 1000.0
        name = e.get("name", "?")
        by_name[name] += dur
        count[name] += 1
        total += dur
    print(f"total device time: {total:.1f} ms over {n_frames} frames "
          f"-> {total/n_frames:.1f} ms/frame\n")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/n_frames:9.2f} ms/frame  x{count[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
