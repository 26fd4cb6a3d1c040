"""MCMC strategy tests (parity bar: reference tests/test_mcmc.cpp —
relocation math, noise injection, refinement mechanics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.ops.mcmc_ops import add_noise, make_binoms, relocation
from lichtfeld_studio_tpu.train.strategies.mcmc import (
    MCMCConfig,
    _sample_multinomial,
    add_new_gs,
    relocate_gs,
)
from lichtfeld_studio_tpu.ops.adam import init_adam
from tests.scene_utils import make_random_splats


def _relocation_loop(op, scale, ratio, binoms):
    """Direct transcription of the reference double loop (RelocationCUDA.cu:27-42)."""
    new_op = 1 - (1 - op) ** (1.0 / ratio)
    denom = 0.0
    for i in range(1, ratio + 1):
        for k in range(i):
            denom += binoms[i - 1, k] * ((-1) ** k / np.sqrt(k + 1)) * new_op ** (k + 1)
    return new_op, (op / denom) * scale


def test_relocation_matches_reference_loop(rng):
    binoms = np.asarray(make_binoms())
    ops = rng.uniform(0.01, 0.99, 16).astype(np.float32)
    scales = rng.uniform(0.01, 1.0, (16, 3)).astype(np.float32)
    ratios = rng.integers(1, 10, 16).astype(np.int32)
    new_op, new_s = relocation(
        jnp.asarray(ops), jnp.asarray(scales), jnp.asarray(ratios), jnp.asarray(binoms)
    )
    for i in range(16):
        eo, es = _relocation_loop(ops[i], scales[i], int(ratios[i]), binoms)
        np.testing.assert_allclose(float(new_op[i]), eo, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(new_s[i]), es, rtol=1e-3)


def test_relocation_ratio_one_identity(rng):
    """ratio=1: new_op == op and scale unchanged (split into one copy)."""
    binoms = make_binoms()
    ops = jnp.asarray(rng.uniform(0.1, 0.9, 8).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.1, 1.0, (8, 3)).astype(np.float32))
    new_op, new_s = relocation(ops, scales, jnp.ones(8, jnp.int32), binoms)
    np.testing.assert_allclose(np.asarray(new_op), np.asarray(ops), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s), np.asarray(scales), rtol=1e-4)


def test_multinomial_distribution():
    probs = jnp.asarray([0.0, 1.0, 3.0, 0.0])
    idx = np.asarray(_sample_multinomial(jax.random.PRNGKey(0), probs, 4000))
    assert set(np.unique(idx)) <= {1, 2}
    frac2 = (idx == 2).mean()
    assert 0.70 < frac2 < 0.80  # expect 0.75


def test_noise_injection_gated_by_opacity(rng):
    n = 8
    splats = make_random_splats(rng, n=n)
    high_op = jnp.full((n, 1), 5.0)  # sigmoid ~ 1 -> gate ~ 0
    low_op = jnp.full((n, 1), -8.0)  # sigmoid ~ 0 -> gate ~ 1
    key = jax.random.PRNGKey(1)
    m_high = add_noise(high_op, splats.scaling, splats.rotation, splats.means,
                       splats.active_mask(), key, jnp.asarray(1.0))
    m_low = add_noise(low_op, splats.scaling, splats.rotation, splats.means,
                      splats.active_mask(), key, jnp.asarray(1.0))
    d_high = float(jnp.abs(m_high - splats.means).max())
    d_low = float(jnp.abs(m_low - splats.means).max())
    assert d_high < 1e-8
    assert d_low > 1e-5


def test_relocate_revives_dead(rng):
    n = 32
    splats = make_random_splats(rng, n=n, capacity=64)
    # kill the first 8 gaussians
    dead_op = splats.opacity.at[:8].set(-15.0)
    splats = splats.replace_trainable({**splats.trainable_dict(), "opacity": dead_op})
    adam = init_adam(splats.trainable_dict(), {k: 0.01 for k in splats.trainable_dict()})
    cfg = MCMCConfig(max_cap=64, min_opacity=0.005)
    new_splats, _ = relocate_gs(jax.random.PRNGKey(0), splats, adam, make_binoms(), cfg)
    op = np.asarray(jax.nn.sigmoid(new_splats.opacity[:n, 0]))
    assert np.all(op >= 0.005 - 1e-6), "dead slots not revived"
    # revived slots must coincide with some alive gaussian's position
    means = np.asarray(new_splats.means)
    old_means = np.asarray(splats.means[8:n])
    for i in range(8):
        d = np.abs(old_means - means[i][None]).sum(axis=1).min()
        assert d < 1e-6


def test_add_new_grows_five_percent(rng):
    n = 40
    splats = make_random_splats(rng, n=n, capacity=64)
    adam = init_adam(splats.trainable_dict(), {k: 0.01 for k in splats.trainable_dict()})
    cfg = MCMCConfig(max_cap=64)
    new_splats, _ = add_new_gs(jax.random.PRNGKey(0), splats, adam, make_binoms(), cfg)
    assert int(new_splats.n_active) == int(1.05 * n)  # 42
    # new slots must be copies of existing gaussians
    means = np.asarray(new_splats.means)
    base = np.asarray(splats.means[:n])
    for i in range(n, int(new_splats.n_active)):
        d = np.abs(base - means[i][None]).sum(axis=1).min()
        assert d < 1e-6


def test_add_new_respects_cap(rng):
    n = 63
    splats = make_random_splats(rng, n=n, capacity=64)
    adam = init_adam(splats.trainable_dict(), {k: 0.01 for k in splats.trainable_dict()})
    cfg = MCMCConfig(max_cap=64)
    new_splats, _ = add_new_gs(jax.random.PRNGKey(0), splats, adam, make_binoms(), cfg)
    assert int(new_splats.n_active) == 64
