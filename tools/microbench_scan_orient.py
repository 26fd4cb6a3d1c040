"""Microbench: prefix-scan orientation inside a Pallas TPU kernel.

The blend kernels spend most of their VPU time in two 7-level shift-op
prefix scans over [CHUNK=128, P=1024] arrays, scanning along axis 0
(the SUBLANE axis: 16 stacked (8,128) tiles, so shifted operands cross
sublane-tile boundaries). Hypothesis: the same scan along the LANE axis
of a [P=1024, CHUNK=128] array (CHUNK spans exactly one 128-lane tile,
shifts become single-tile lane rotates) is materially cheaper.

Measures both orientations doing R repetitions of (prefix_prod +
prefix_sum + a fixed number of elementwise passes) on VMEM-resident data.
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
R = 64  # scan repetitions per program
GRID = 64  # programs


def _scan_axis0(x, op, pad_val):
    n = x.shape[0]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, ((shift, 0), (0, 0)), constant_values=pad_val)[:n]
        x = op(x, shifted)
        shift *= 2
    return x


def _scan_axis1(x, op, pad_val):
    n = x.shape[1]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, ((0, 0), (shift, 0)), constant_values=pad_val)[:, :n]
        x = op(x, shifted)
        shift *= 2
    return x


def _kernel(x_ref, o_ref, *, axis: int):
    x = x_ref[...]
    acc = jnp.zeros_like(x[0:1])
    scan = _scan_axis0 if axis == 0 else _scan_axis1

    def body(i, carry):
        x_c, acc = carry
        p = scan(1.0 - 1e-4 * x_c, jnp.multiply, 1.0)
        s = scan(x_c * p, jnp.add, 0.0)
        acc = acc + (p[-1:] if axis == 0 else s[-1:])
        x_c = x_c * 0.9999 + 1e-7 * s
        return x_c, acc

    x, acc = jax.lax.fori_loop(0, R, body, (x, acc))
    o_ref[...] = acc + x[0:1] * 0.0


def run(shape, axis):
    x = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, shape), jnp.float32)
    f = pl.pallas_call(
        functools.partial(_kernel, axis=axis),
        grid=(GRID,),
        in_specs=[pl.BlockSpec(shape, lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, shape[1]), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, shape[1]), jnp.float32),
    )
    f = jax.jit(f)
    r = f(x)
    np.asarray(r[0, 0])  # fence
    t0 = time.perf_counter()
    r = f(x)
    np.asarray(r[0, 0])
    dt = time.perf_counter() - t0
    per_scanpair = dt / (GRID * R)
    print(f"shape={shape} scan_axis={axis}: {dt*1e3:.2f} ms total, "
          f"{per_scanpair*1e6:.2f} us per (prod+sum) scan pair")
    return per_scanpair


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    a = run((CHUNK, P), 0)   # current orientation: scan along sublanes
    b = run((P, CHUNK), 1)   # candidate: scan along lanes (one lane-tile)
    print(f"lane-major speedup on scans: {a/b:.2f}x")
