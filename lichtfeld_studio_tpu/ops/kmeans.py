"""K-means for SOG codebook quantization.

Reference: kernels/kmeans.cu:1-307 (GPU k-means with a 1-D specialization +
general N-D, used by the SOG writer via cluster_1d/cluster_nd,
src/core/sogs.cpp:38-52). TPU version: jitted Lloyd iterations — the
assignment step is one big distance matmul on the MXU, the update a
segment-sum; k-means++-lite init by striding the sorted values (1-D) /
random sampling (N-D).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "iterations"))
def kmeans_1d(values: jax.Array, k: int = 256, iterations: int = 10):
    """1-D k-means. Returns (centroids [k], labels [N] int32)."""
    n = values.shape[0]
    sorted_v = jnp.sort(values)
    idx = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k * (n - 1)
    centroids = sorted_v[idx.astype(jnp.int32)]

    def step(centroids, _):
        # nearest centroid via searchsorted over sorted centroids' midpoints
        c_sorted = jnp.sort(centroids)
        mids = 0.5 * (c_sorted[1:] + c_sorted[:-1])
        labels = jnp.searchsorted(mids, values).astype(jnp.int32)
        sums = jax.ops.segment_sum(values, labels, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones_like(values), labels, num_segments=k)
        new_c = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), c_sorted)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iterations)
    c_sorted = jnp.sort(centroids)
    mids = 0.5 * (c_sorted[1:] + c_sorted[:-1])
    labels = jnp.searchsorted(mids, values).astype(jnp.int32)
    return c_sorted, labels


@partial(jax.jit, static_argnames=("k", "iterations"))
def kmeans_nd(points: jax.Array, k: int, iterations: int = 10, seed: int = 0):
    """N-D k-means. points [N, D]. Returns (centroids [k, D], labels [N])."""
    n, d = points.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (k,), replace=False if k <= n else True)
    centroids = points[init_idx]

    def step(centroids, _):
        # distance via the MXU: |p - c|^2 = |p|^2 - 2 p.c + |c|^2
        dots = jnp.dot(points, centroids.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.sum(centroids**2, axis=1)[None, :] - 2.0 * dots
        labels = jnp.argmin(d2, axis=1).astype(jnp.int32)
        sums = jax.ops.segment_sum(points, labels, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,)), labels, num_segments=k)
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centroids)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iterations)
    dots = jnp.dot(points, centroids.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.sum(centroids**2, axis=1)[None, :] - 2.0 * dots
    labels = jnp.argmin(d2, axis=1).astype(jnp.int32)
    return centroids, labels
