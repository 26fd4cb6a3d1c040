"""Device-level trace of the train step: run N steps under jax.profiler.trace
and aggregate per-kernel device durations from the chrome-trace JSON.

This is the ground-truth breakdown (XLA fusion granularity, Pallas kernels
included) — the stage-level profiler (profile_train.py) measures dispatch
walls that overlap under async execution.
"""

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
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lichtfeld_studio_tpu.core.camera import CameraParams, look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.train.state import (
        StepFlags,
        TrainConfig,
        init_train_state,
        make_lrs,
        train_steps_scanned,
    )
    from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig

    W, H = 1296, 840
    TS = int(os.environ.get("LFS_BENCH_TS", 32))
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

    cfg = TrainConfig(
        iterations=30_000, raster_mode="pallas", instance_cap=ICAP, k_max=1024,
        tile_size=TS,
        mcmc=MCMCConfig(max_cap=CAP, start_refine=5, stop_refine=1000, refine_every=10),
        lr_gamma=0.01 ** (1.0 / 30_000),
    )
    lrs = make_lrs(1.6e-5, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    state = init_train_state(splats, lrs, seed=0)
    plain = StepFlags()

    K_SCAN = 10
    stacked_cam = CameraParams(
        w2c=jnp.tile(cam.w2c[None], (K_SCAN, 1, 1)),
        cam_position=jnp.tile(cam.cam_position[None], (K_SCAN, 1)),
        K=jnp.tile(cam.K[None], (K_SCAN, 1)),
        uid=jnp.zeros((K_SCAN,), jnp.int32),
        width=W, height=H,
    )
    gts = jnp.tile(gt[None], (K_SCAN, 1, 1, 1))

    # compile + warm
    state, metrics = train_steps_scanned(state, stacked_cam, gts, bg, cfg, plain)
    _ = float(metrics["loss"][-1])
    state, metrics = train_steps_scanned(state, stacked_cam, gts, bg, cfg, plain)
    _ = float(metrics["loss"][-1])
    print("warm; tracing...", file=sys.stderr, flush=True)

    trace_dir = "/tmp/lfs_trace"
    os.system(f"rm -rf {trace_dir}")
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0  # 1M host-python events truncate the trace
    opts.host_tracer_level = 1
    jax.profiler.start_trace(trace_dir, profiler_options=opts)
    state, metrics = train_steps_scanned(state, stacked_cam, gts, bg, cfg, plain)
    _ = float(metrics["loss"][-1])
    jax.profiler.stop_trace()

    # parse chrome trace
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace.json.gz found; files:", file=sys.stderr)
        os.system(f"find {trace_dir} -type f | head -50 >&2")
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-side complete events live under pids whose process_name mentions TPU/device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_name = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e["pid"], "")
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        low = (pname + " " + tname).lower()
        if ("tpu" not in low and "device" not in low and "/device" not in low) or "steps" in low:
            continue
        if "xla op" in low or "ops" in low or True:
            dur = e.get("dur", 0) / 1000.0  # us -> ms
            name = e.get("name", "?")
            by_name[name] += dur
            count[name] += 1
            total += dur
    print(f"\npid/thread names seen: {sorted(set(pid_names.values()))[:10]}", file=sys.stderr)
    print(f"total device time: {total:.1f} ms over {K_SCAN} steps -> {total/K_SCAN:.1f} ms/step\n")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])
    for name, dur in rows[:60]:
        print(f"{dur/K_SCAN:9.2f} ms/step  x{count[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
