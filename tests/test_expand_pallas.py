"""Parity of the Pallas instance-expansion kernel (interpret mode) against
the XLA scatter-marker construction in ops/tiles.py.

Covers the layout hazards: interleaved runs of culled (n_touched == 0)
gaussians (the duplicate-offset flood that forces the compaction sort),
leading/trailing zeros, overflow (total > instance_cap), an empty view
(total == 0), and payload words with all 32 bits set (sign handling in the
byte-split matmul)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.kernels.expand_pallas import expand_instances


def _xla_expand(n_touched, payload_t, instance_cap):
    """The scatter-marker construction (ops/tiles.py XLA path)."""
    offsets = (jnp.cumsum(n_touched) - n_touched).astype(jnp.int32)
    slot = jnp.arange(instance_cap, dtype=jnp.int32)
    marker = jnp.zeros((instance_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.cumsum(marker) - 1
    seg_start = jax.lax.cummax(jnp.where(marker > 0, slot, 0))
    rank = slot - seg_start
    pl_t = jnp.take(payload_t, g, axis=1)
    return g, rank, pl_t


def _case(nt, cap, seed=0, counts_bits=None):
    nt = np.asarray(nt, np.int32)
    c = nt.shape[0]
    rng = np.random.default_rng(seed)
    payload = rng.integers(-(2**31), 2**31, size=(4, c), dtype=np.int64).astype(
        np.int32
    )
    # w1 packs the count at bits 10+ (tiles.py layout; the counts_bits path
    # recovers counts from this instead of a ride-along sort operand)
    payload[1] = (rng.integers(1, 1024, c).astype(np.int32)) | (nt << 10)

    nt_j, pl_j = jnp.asarray(nt), jnp.asarray(payload)
    g_k, r_k, p_k = jax.jit(expand_instances, static_argnums=(2, 3))(
        nt_j, pl_j, cap, counts_bits
    )
    g_x, r_x, p_x = jax.jit(_xla_expand, static_argnums=2)(nt_j, pl_j, cap)

    total = min(int(nt.sum()), cap)
    slot = np.arange(cap)
    # validity from the reference construction
    valid = (slot < total) & (np.asarray(r_x) < nt[np.asarray(g_x)])
    # kernel must agree on which slots are valid...
    valid_k = (slot < total) & (np.asarray(r_k) < nt[np.asarray(g_k)])
    np.testing.assert_array_equal(valid, valid_k)
    # ...and match exactly on them
    np.testing.assert_array_equal(np.asarray(g_k)[valid], np.asarray(g_x)[valid])
    np.testing.assert_array_equal(np.asarray(r_k)[valid], np.asarray(r_x)[valid])
    np.testing.assert_array_equal(
        np.asarray(p_k)[:, valid], np.asarray(p_x)[:, valid]
    )
    # in-bounds garbage everywhere (callers index payload tables with g)
    assert np.asarray(g_k).min() >= 0 and np.asarray(g_k).max() < nt.shape[0]


def test_dense_segments():
    _case([3, 1, 4, 1, 5, 9, 2, 6], cap=64)


def test_interleaved_zero_floods():
    rng = np.random.default_rng(1)
    nt = rng.integers(0, 5, 400).astype(np.int32)
    nt[50:260] = 0  # a 210-gaussian culled run sharing one offset
    nt[0:3] = 0  # leading zeros
    nt[-40:] = 0  # trailing dead tail
    _case(nt, cap=1024, seed=1)


def test_overflow_total_beyond_cap():
    nt = np.full(300, 7, np.int32)  # total 2100 > cap 512
    _case(nt, cap=512, seed=2)


def test_empty_view():
    _case(np.zeros(128, np.int32), cap=256)


def test_single_giant_segment():
    nt = np.zeros(64, np.int32)
    nt[10] = 900  # one segment spanning many chunks
    _case(nt, cap=1024, seed=3)


@pytest.mark.parametrize("seed", [4, 5])
def test_randomized(seed):
    rng = np.random.default_rng(seed)
    c = int(rng.integers(10, 700))
    nt = rng.integers(0, 6, c).astype(np.int32)
    cap = int(rng.integers(1, 4)) * 256 + int(rng.integers(0, 200))
    _case(nt, cap=cap, seed=seed)


def test_counts_packed_in_payload():
    """Production path (tiles.py): counts recovered from w1 >> 10."""
    rng = np.random.default_rng(6)
    nt = rng.integers(0, 5, 500).astype(np.int32)
    nt[100:300] = 0
    _case(nt, cap=1024, seed=6, counts_bits=10)
