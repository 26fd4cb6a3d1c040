"""Microbench: does bf16 elementwise VPU work run ~2x faster than f32 on
this chip (v5e packs bf16 as (16,128) tiles — two values per 32-bit register
slot), and does pltpu.roll beat pad+slice for the prefix-scan shifts?

Decides whether the blend kernels' [CHUNK, P] pipelines (prefix scans, masks,
selects) are worth converting to bf16 where the error budget allows
(inference blend; possibly the gradient replay's sum scan).
"""

import functools
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHUNK = 128
P = 1024
R = 64
GRID = 64


def _elemwise_kernel(x_ref, o_ref, *, reps, dtype):
    x = x_ref[...].astype(dtype)
    c = jnp.asarray(1.0000001, dtype)

    def body(i, acc):
        # 4 dependent elementwise passes per rep: mul, add, mul, max
        acc = acc * c
        acc = acc + acc
        acc = acc * jnp.asarray(0.5, dtype)
        acc = jnp.maximum(acc, jnp.asarray(0.0, dtype))
        return acc

    x = jax.lax.fori_loop(0, reps, body, x)
    o_ref[...] = x.astype(jnp.float32)


def _scan_pad(x, pad_val):
    n = x.shape[0]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, ((shift, 0), (0, 0)), constant_values=pad_val)[:n]
        x = x * shifted
        shift *= 2
    return x


def _scan_roll(x, pad_val):
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, 0)
        shifted = jnp.where(row >= shift, rolled, jnp.asarray(pad_val, x.dtype))
        x = x * shifted
        shift *= 2
    return x


def _scan_kernel(x_ref, o_ref, *, reps, dtype, impl):
    x = x_ref[...].astype(dtype)
    scan = _scan_pad if impl == "pad" else _scan_roll

    def body(i, acc):
        acc = scan(acc, 1.0)
        acc = acc * jnp.asarray(0.999999, dtype)  # keep values sane
        return acc

    x = jax.lax.fori_loop(0, reps, body, x)
    o_ref[...] = x.astype(jnp.float32)


def run(kernel, name):
    x = jnp.asarray(np.random.default_rng(0).uniform(0.99, 1.0, (CHUNK, P)).astype(np.float32))
    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((CHUNK, P), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((CHUNK, P), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CHUNK, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )
    f = jax.jit(f)
    r = f(x)
    float(r[0, 0])  # fence
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(x)
    float(r[0, 0])
    dt = (time.perf_counter() - t0) / 10
    per_pass = dt / (GRID * R) * 1e9
    print(f"{name:34s}: {dt*1e3:7.3f} ms total, {per_pass:8.1f} ns per rep-block")
    return dt


def main():
    print("backend:", jax.default_backend(), jax.devices())
    e32 = run(functools.partial(_elemwise_kernel, reps=R, dtype=jnp.float32), "elemwise f32 [128,1024] x4ops")
    e16 = run(functools.partial(_elemwise_kernel, reps=R, dtype=jnp.bfloat16), "elemwise bf16 [128,1024] x4ops")
    print(f"  bf16 elemwise speedup: {e32/e16:.2f}x")
    s32p = run(functools.partial(_scan_kernel, reps=R, dtype=jnp.float32, impl="pad"), "scan f32 pad+slice")
    s32r = run(functools.partial(_scan_kernel, reps=R, dtype=jnp.float32, impl="roll"), "scan f32 roll+select")
    s16p = run(functools.partial(_scan_kernel, reps=R, dtype=jnp.bfloat16, impl="pad"), "scan bf16 pad+slice")
    print(f"  roll vs pad: {s32p/s32r:.2f}x   bf16 scan speedup: {s32p/s16p:.2f}x")


if __name__ == "__main__":
    main()
