"""Microbench: two-key sort alternatives + segment-prefix gather layouts.

Informs the binning sort strategy (ops/tiles.py) and the gradient
segment-sum gather (segment_sum_by_prefix): on v5e the two-key comparator
sort runs ~7x slower than a single-key sort, and a row gather from a
column-major table runs ~3x slower than from a row-major one.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(f, *args, n=20):
    r = f(*args)
    jax_block(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax_block(r)
    return (time.perf_counter() - t0) / n * 1000


def jax_block(r):
    import jax

    jax.block_until_ready(r)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    I = 2_500_000
    T = 4300
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, T, I), jnp.int32)
    depth = jnp.asarray(rng.integers(0, 2**30, I), jnp.int32)
    slot = jnp.arange(I, dtype=jnp.int32)
    g = jnp.asarray(rng.integers(0, 1_000_000, I), jnp.int32)

    @jax.jit
    def twokey(tile, depth, slot, g):
        return jax.lax.sort((tile, depth, slot, g), dimension=0, num_keys=2, is_stable=False)

    @jax.jit
    def twopass(tile, depth, slot, g):
        d2, t2, s2, g2 = jax.lax.sort((depth, tile, slot, g), dimension=0, num_keys=1, is_stable=False)
        return jax.lax.sort((t2, d2, s2, g2), dimension=0, num_keys=1, is_stable=True)

    @jax.jit
    def onekey4(tile, depth, slot, g):
        return jax.lax.sort((tile, depth, slot, g), dimension=0, num_keys=1, is_stable=False)

    @jax.jit
    def onekey4_stable(tile, depth, slot, g):
        return jax.lax.sort((tile, depth, slot, g), dimension=0, num_keys=1, is_stable=True)

    print("two-key 4op      :", timeit(twokey, tile, depth, slot, g), "ms")
    print("one-key 4op      :", timeit(onekey4, tile, depth, slot, g), "ms")
    print("one-key 4op stbl :", timeit(onekey4_stable, tile, depth, slot, g), "ms")
    print("two-pass radix   :", timeit(twopass, tile, depth, slot, g), "ms")

    # --- segment-prefix gather: [Q,10] rows from [I,10] table ---
    Q = 1_000_000
    table = jnp.asarray(rng.normal(size=(I + 1, 10)), jnp.float32)
    idx = jnp.asarray(np.sort(rng.integers(0, I, Q + 1)), jnp.int32)

    @jax.jit
    def row_gather(table, idx):
        return table[idx]

    @jax.jit
    def col_gather_t(table_t, idx):
        return table_t[:, idx]

    @jax.jit
    def ten_scalar(table_t, idx):
        return jnp.stack([table_t[k][idx] for k in range(10)], axis=0)

    table_t = jnp.asarray(np.asarray(table).T.copy())
    print("row gather [1M,10]   :", timeit(row_gather, table, idx), "ms")
    print("col gather [10,1M]   :", timeit(col_gather_t, table_t, idx), "ms")
    print("10x scalar gather    :", timeit(ten_scalar, table_t, idx), "ms")

    # cumsum orientation
    d = jnp.asarray(rng.normal(size=(I, 10)), jnp.float32)
    dt = jnp.asarray(np.asarray(d).T.copy())

    @jax.jit
    def cs_rows(d):
        return jnp.cumsum(d, axis=0)

    @jax.jit
    def cs_cols(dt):
        return jnp.cumsum(dt, axis=1)

    print("cumsum [2.5M,10] ax0 :", timeit(cs_rows, d), "ms")
    print("cumsum [10,2.5M] ax1 :", timeit(cs_cols, dt), "ms")


if __name__ == "__main__":
    main()
