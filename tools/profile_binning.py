"""Stage-level micro-profile of the binning pipeline primitives at bench
geometry (2.5M instance cap, 4293 tiles). Times each primitive in isolation
with a forced readback."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def force(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0])


def timeit(f, *args, n=10, label=""):
    out = f(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    force(out)
    dt = (time.time() - t0) / n
    print(f"{label:52s} {dt*1000:8.1f} ms", flush=True)
    return out, dt


def main():
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    CAP = 2_500_000
    N = 1_000_000
    T = 4293
    CHUNK = 256
    NFILL = T * (CHUNK - 1)
    IPAD = CAP + NFILL
    rng = np.random.default_rng(0)

    tile = jnp.asarray(rng.integers(0, T + 1, CAP, dtype=np.int32))
    depth = jnp.asarray(rng.integers(0, 2**30, CAP, dtype=np.int32))
    slot = jnp.arange(CAP, dtype=jnp.int32)
    g = jnp.asarray(rng.integers(0, N, CAP, dtype=np.int32))
    payload = jnp.asarray(rng.integers(0, 2**30, (N, 4), dtype=np.int32))
    ntouched = jnp.asarray(rng.integers(0, 5, N, dtype=np.int32))

    timeit(jax.jit(lambda t, d, s, gg: jax.lax.sort((t, d, s, gg), dimension=0, num_keys=2)),
           tile, depth, slot, g, label="sort1: 2-key 4-array [2.5M]")

    tile_sorted = jnp.sort(tile)
    timeit(jax.jit(lambda ts: jnp.searchsorted(ts, jnp.arange(T + 1, dtype=jnp.int32), side="left")),
           tile_sorted, label="searchsorted [2.5M] w/ 4.3k queries (scan)")
    timeit(jax.jit(lambda ts: jnp.searchsorted(ts, jnp.arange(T + 1, dtype=jnp.int32), side="left", method="compare_all")),
           tile_sorted, label="searchsorted compare_all")
    timeit(jax.jit(lambda t: jax.ops.segment_sum(jnp.ones_like(t), t, num_segments=T + 1)),
           tile_sorted, label="segment_sum counts [2.5M]")

    def owner(off, size):
        marker = jnp.zeros((size,), jnp.int32).at[off].add(1, mode="drop")
        return jnp.cumsum(marker) - 1

    off = jnp.asarray(np.sort(rng.integers(0, NFILL, T).astype(np.int32)))
    timeit(jax.jit(lambda o: owner(o, NFILL)), off, label="owner markers+cumsum [1.1M]")

    pos = jnp.asarray(rng.permutation(IPAD)[:CAP].astype(np.int32))
    posf = jnp.asarray(rng.permutation(IPAD)[:NFILL].astype(np.int32))
    gv = jnp.asarray(rng.integers(0, N, IPAD, dtype=np.int32))
    sv = jnp.asarray(rng.integers(0, CAP, IPAD, dtype=np.int32))

    def sort2(p, pf, gvv, svv):
        pall = jnp.concatenate([p, pf])
        return jax.lax.sort((pall, gvv, svv), dimension=0, num_keys=1)

    timeit(jax.jit(sort2), pos, posf, gv, sv, label="sort2: 1-key 3-array [3.6M]")

    rows = [jnp.asarray(rng.standard_normal(IPAD).astype(np.float32)) for _ in range(8)]
    valid = jnp.asarray(rng.integers(0, 2, IPAD).astype(bool))

    def sort3(sl, vl, *rs):
        rs = [jnp.where(vl, r, 0.0) for r in rs]
        out = jax.lax.sort((sl, *rs), dimension=0, num_keys=1)
        return [c[:CAP] for c in out[1:]]

    timeit(jax.jit(sort3), sv, valid, *rows, label="sort3: 1-key 9-array [3.6M] + trim")

    d10 = jnp.asarray(rng.standard_normal((CAP, 10)).astype(np.float32))
    timeit(jax.jit(lambda d: jnp.cumsum(d, axis=0)), d10, label="cumsum [2.5M,10]")

    def segdiff(d, nt):
        s = jnp.cumsum(d, axis=0)
        s0 = jnp.concatenate([jnp.zeros((1, 10), jnp.float32), s], axis=0)
        o = jnp.cumsum(nt) - nt
        e = jnp.minimum(o + nt, CAP)
        o = jnp.minimum(o, CAP)
        return s0[e] - s0[o]

    timeit(jax.jit(segdiff), d10, ntouched, label="cumsum+segdiff [2.5M,10] -> [1M,10]")

    timeit(jax.jit(lambda p, gg: p[gg]), payload, g, label="payload gather [2.5M,4] int32")

    feat8 = jnp.asarray(rng.standard_normal((N, 8)).astype(np.float32))
    gpad = jnp.asarray(rng.integers(0, N, IPAD, dtype=np.int32))
    vpad = jnp.asarray(rng.integers(0, 2, IPAD).astype(bool))
    timeit(jax.jit(lambda f, gp, v: jnp.where(v[:, None], f[gp], 0.0)),
           feat8, gpad, vpad, label="feat gather [3.6M,8] f32")
    timeit(jax.jit(lambda f, gp, v: jnp.where(v[:, None], f[gp], 0.0).T),
           feat8, gpad, vpad, label="feat gather + transpose -> [8,3.6M]")
    gath = jnp.asarray(rng.standard_normal((IPAD, 8)).astype(np.float32))
    timeit(jax.jit(lambda x: x.T + 0.0), gath, label="transpose only [3.6M,8]->[8,3.6M]")

    # cumsums over [2.5M] int32 (expansion offsets)
    timeit(jax.jit(lambda x: jnp.cumsum(x)), ntouched, label="cumsum [1M] int32")
    big = jnp.asarray(rng.integers(0, 3, CAP, dtype=np.int32))
    timeit(jax.jit(lambda x: jnp.cumsum(x)), big, label="cumsum [2.5M] int32")


if __name__ == "__main__":
    main()
