"""Microbench: per-chunk DMA cost of the blend kernels' streaming pattern.

Hypothesis: the blend kernels are bound by the 8-ROW STRIDED chunk copy
([8, chunk] slice of an [8, I] feature-major array = 8 separate 512 B
segments, each a descriptor/burst), not by latency or VPU compute. Compares:
  row8:   [8, chunk]   slice of [8, NB*chunk]    (current layout)
  blk:    [1, 8*chunk] slice of [1, NB*8*chunk]  (contiguous, same bytes)
  row8x4: [8, 4*chunk] slice (4 chunks per DMA, strided)
  blk_x4: [1, 32*chunk] contiguous (4 chunks per DMA)
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
    os.path.expanduser("~/.cache/jax_tpu_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CHUNKW = 128
NB = 8192  # chunks streamed per run
SLOTS = 4


def _stream_kernel(x_hbm, o_ref, scr, sem, *, rows, width, nb):
    def dma(slot, ci):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(ci * width, width)], scr.at[slot], sem.at[slot]
        )

    for k in range(SLOTS - 1):
        @pl.when(k < nb)
        def _(k=k):
            dma(k, k).start()

    def body(ci, acc):
        slot = ci % SLOTS

        @pl.when(ci + SLOTS - 1 < nb)
        def _():
            dma((ci + SLOTS - 1) % SLOTS, ci + SLOTS - 1).start()

        dma(slot, ci).wait()
        return acc + scr[slot][0, 0]

    acc = jax.lax.fori_loop(0, nb, body, jnp.float32(0))
    o_ref[0, 0] = acc


def run(label, rows, width, nb):
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(rows, nb * width)).astype(np.float32)
    )
    f = pl.pallas_call(
        functools.partial(_stream_kernel, rows=rows, width=width, nb=nb),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((SLOTS, rows, width), jnp.float32),
            pltpu.SemaphoreType.DMA((SLOTS,)),
        ],
    )
    f = jax.jit(f)
    r = f(x)
    float(r[0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(x)
    float(r[0, 0])
    dt = (time.perf_counter() - t0) / 10
    bytes_total = rows * width * nb * 4
    print(
        f"{label:12s}: {dt*1e3:7.2f} ms for {nb} DMAs of [{rows},{width}] "
        f"-> {dt/nb*1e6:6.3f} us/DMA, {bytes_total/dt/1e9:7.1f} GB/s",
        flush=True,
    )


def main():
    print("backend:", jax.default_backend(), jax.devices())
    run("row8", 8, CHUNKW, NB)
    run("blk", 1, 8 * CHUNKW, NB)
    run("row8x4", 8, 4 * CHUNKW, NB // 4)
    run("blk_x4", 1, 32 * CHUNKW, NB // 4)
    run("row2", 2, CHUNKW, NB)
    run("row16", 16, CHUNKW, NB)


if __name__ == "__main__":
    main()
