"""Microbench: row-gather cost law on TPU (table rows x width x #indices,
sorted vs random), plus sort variants. Sync via scalar fetch — on the axon
relay, block_until_ready does NOT wait for execution."""

import os
import sys
import time
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

    rng = np.random.default_rng(0)

    def timeit(name, f, *args, n=10):
        r = f(*args)
        _ = float(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        _ = float(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"{name}: {ms:8.2f} ms")
        return ms

    def bench_gather(T, W, Q, sorted_idx):
        table = jnp.asarray(rng.normal(size=(T, W)), jnp.float32)
        idx = rng.integers(0, T, Q)
        if sorted_idx:
            idx = np.sort(idx)
        idx = jnp.asarray(idx, jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        timeit(
            f"gather table[{T:>9},{W:>2}] idx {Q:>9} {'sorted' if sorted_idx else 'random'}",
            f, table, idx,
        )

    for T, W, Q, s in [
        (2_500_001, 10, 1_000_001, True),
        (2_500_001, 10, 1_000_001, False),
        (1_000_000, 8, 3_594_715, False),
        (2_500_001, 16, 1_000_001, True),
    ]:
        bench_gather(T, W, Q, s)

    I = 2_500_000
    T = 4300
    tile = jnp.asarray(rng.integers(0, T, I), jnp.int32)
    depth = jnp.asarray(rng.integers(0, 2**30, I), jnp.int32)
    slot = jnp.arange(I, dtype=jnp.int32)
    g = jnp.asarray(rng.integers(0, 1_000_000, I), jnp.int32)

    timeit("sort 2key 4op 2.5M", jax.jit(
        lambda a, b, c, d: jax.lax.sort((a, b, c, d), dimension=0, num_keys=2, is_stable=False)
    ), tile, depth, slot, g)
    timeit("sort 1key 4op 2.5M", jax.jit(
        lambda a, b, c, d: jax.lax.sort((a, b, c, d), dimension=0, num_keys=1, is_stable=False)
    ), tile, depth, slot, g)

    def twopass(a, b, c, d):
        d2, t2, s2, g2 = jax.lax.sort((b, a, c, d), dimension=0, num_keys=1, is_stable=False)
        return jax.lax.sort((t2, d2, s2, g2), dimension=0, num_keys=1, is_stable=True)

    timeit("sort 2pass stable  ", jax.jit(twopass), tile, depth, slot, g)

    # 9-operand f32 slot sort at 3.59M (the gradient reduction sort)
    I2 = 3_594_715
    key = jnp.asarray(rng.permutation(I2), jnp.int32)
    vals = [jnp.asarray(rng.normal(size=I2), jnp.float32) for _ in range(8)]
    timeit("sort 1key 9op 3.59M", jax.jit(
        lambda k, *v: jax.lax.sort((k, *v), dimension=0, num_keys=1, is_stable=False)
    ), key, *vals)

    # segment-sum alternatives: prefix+gather vs one fat sorted-gather
    d = jnp.asarray(rng.normal(size=(I, 10)), jnp.float32)
    off = jnp.asarray(np.sort(rng.integers(0, I, 1_000_001)), jnp.int32)

    def prefix_gather(d, off):
        s = jnp.cumsum(d, axis=0)
        s0 = jnp.concatenate([jnp.zeros((1, 10), jnp.float32), s], axis=0)
        q = s0[off]
        return q[1:] - q[:-1]

    timeit("segsum prefix+gather", jax.jit(prefix_gather), d, off)

    # LANE-axis gather row-count law (the production inference feature
    # gather is take([W, C], idx, axis=1)): does halving W halve the cost,
    # or is the cost per-INDEX? Decides whether tile-relative bf16 row
    # packing (VERDICT r4 item 2) can buy render time.
    C = 1_000_000
    Q2 = 2_000_000
    idx2 = jnp.asarray(rng.integers(0, C, Q2), jnp.int32)
    for Wr in (16, 8, 4, 2, 1):
        tab = jnp.asarray(rng.normal(size=(Wr, C)), jnp.float32)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
        timeit(f"lane-gather [{Wr:>2},1M] idx 2M f32", f, tab, idx2)
    # and the bf16 variant (half the bytes per row)
    for Wr in (8, 4):
        tab = jnp.asarray(rng.normal(size=(Wr, C)), jnp.bfloat16)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=1))
        timeit(f"lane-gather [{Wr:>2},1M] idx 2M bf16", f, tab, idx2)


if __name__ == "__main__":
    main()
