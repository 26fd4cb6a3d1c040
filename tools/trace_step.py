"""Capture a device trace of the full train step (fwd+bwd+update) and dump
the top XLA ops by self-time. Usage: python tools/trace_step.py [outdir]"""

import glob
import gzip
import json
import os
import sys
import time
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

    from lichtfeld_studio_tpu.core.camera import look_at_camera
    from lichtfeld_studio_tpu.core.splat_data import SplatData
    from lichtfeld_studio_tpu.train.state import (
        StepFlags, TrainConfig, init_train_state, make_lrs, train_step,
    )
    from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig

    W, H = 1296, 840
    CAP = 1_000_000
    N0 = 600_000
    ICAP = 2_500_000
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
        mcmc=MCMCConfig(max_cap=CAP, start_refine=5, stop_refine=1000, refine_every=10),
        lr_gamma=0.01 ** (1.0 / 30_000),
    )
    lrs = make_lrs(1.6e-5, 2.5e-3, 5e-3, 1e-3, 0.05, splats.scene_scale)
    state = init_train_state(splats, lrs, seed=0)

    # cam/gt/bg as ARGS, not closures: closed-over arrays become compile-time
    # constants and XLA constant-folds everything derived from them on the
    # 1-core compile host — measured 870 MB executable / ~5 min compile for
    # the closure form of this very wrapper vs 17 MB for the arg form
    # (PERFNOTES r4 ledger, compile-time section).
    jf = jax.jit(lambda st, c, g, b: train_step(st, c, g, b, cfg, StepFlags()))
    f = lambda st: jf(st, cam, gt, bg)
    state2, m = f(state)
    _ = float(m["loss"])

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lfs_trace"
    import shutil; shutil.rmtree(outdir, ignore_errors=True)
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state2, m = f(state)
        _ = float(m["loss"])
    jax.profiler.stop_trace()
    print("trace written", flush=True)

    # parse trace: sum durations per hlo op name from the xplane pb? Use the
    # trace-events json if present.
    evs = sorted(
        glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True),
        key=os.path.getmtime,
    )
    if not evs:
        print("no trace.json.gz found; files:",
              [str(p) for p in Path(outdir).rglob("*")][:20])
        return
    with gzip.open(evs[-1], "rt") as fh:
        data = json.load(fh)
    tot = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            tot[name] += ev["dur"]
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:60]
    for name, dur in rows:
        print(f"{dur/1000/3:10.2f} ms  {name[:120]}")


if __name__ == "__main__":
    main()
