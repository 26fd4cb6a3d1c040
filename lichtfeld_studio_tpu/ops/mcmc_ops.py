"""MCMC densification device ops: relocation (Eq. 9 of "3DGS as MCMC") and
opacity-gated noise injection.

Reference kernels: gsplat/RelocationCUDA.cu:12-111 (relocation_kernel) and
:113-180 (add_noise_kernel). TPU redesign: the double binomial-series loop
becomes one [N,51] term table contracted with the binomial matrix on the MXU
followed by a cumulative sum and a gather at `ratio` — no per-thread loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat

N_MAX = 51  # binomial table size (reference mcmc.cpp:459-472)


def make_binoms(n_max: int = N_MAX) -> jnp.ndarray:
    """[n_max, n_max] float32 table of C(n, k)."""
    import numpy as np
    from math import comb

    b = np.zeros((n_max, n_max), np.float32)
    for n in range(n_max):
        for k in range(n + 1):
            b[n, k] = float(comb(n, k))
    return jnp.asarray(b)


def relocation(
    opacities: jax.Array,  # [N] activated opacity of the sampled sources
    scales: jax.Array,  # [N, 3] activated (exp) scales
    ratios: jax.Array,  # [N] int32 split counts, in [1, n_max]
    binoms: jax.Array,  # [n_max, n_max]
) -> tuple[jax.Array, jax.Array]:
    """New (opacity, scale) when a gaussian is split into `ratio` copies.

    new_op = 1 - (1 - op)^(1/ratio)
    new_scale = op / sum_{i=1..ratio} sum_{k=0..i-1} C(i-1,k) (-1)^k/sqrt(k+1) new_op^{k+1} * scale
    (RelocationCUDA.cu:27-42)
    """
    n_max = binoms.shape[0]
    ratios = jnp.clip(ratios, 1, n_max)
    r = ratios.astype(jnp.float32)
    new_op = 1.0 - jnp.power(jnp.clip(1.0 - opacities, 1e-12, 1.0), 1.0 / r)  # [N]

    k = jnp.arange(n_max, dtype=jnp.float32)  # [K]
    # term_k = (-1)^k / sqrt(k+1) * new_op^{k+1}
    sign = 1.0 - 2.0 * (jnp.arange(n_max) % 2).astype(jnp.float32)
    terms = sign / jnp.sqrt(k + 1.0) * jnp.power(new_op[:, None], k[None, :] + 1.0)  # [N, K]
    # inner_i = sum_k binoms[i-1, k<i] * term_k  -> rows i-1 of the triangular table
    inner = jnp.einsum(
        "nk,ik->ni", terms, binoms, precision=jax.lax.Precision.HIGHEST
    )  # [N, n_max] where column i-1 holds inner_i
    denom_cum = jnp.cumsum(inner, axis=1)  # [N, n_max]: sum over i=1..col+1
    denom = jnp.take_along_axis(denom_cum, (ratios - 1)[:, None], axis=1)[:, 0]
    coeff = opacities / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    new_scales = coeff[:, None] * scales
    return new_op, new_scales


def add_noise(
    logit_opacities: jax.Array,  # [C] or [C, 1]
    log_scales: jax.Array,  # [C, 3]
    quats: jax.Array,  # [C, 4]
    means: jax.Array,  # [C, 3]
    active: jax.Array,  # [C] bool
    key: jax.Array,
    current_lr: jax.Array,  # scheduler lr * noise_lr (5e5), mcmc.cpp:349-367
) -> jax.Array:
    """Returns updated means with covariance-shaped, opacity-gated noise
    (RelocationCUDA.cu add_noise_kernel:113-145):
      noise_factor = lr * sigmoid(-100 * (sigmoid(op) - 0.005))
      means += noise_factor * (R S^2 R^T) @ randn
    """
    if logit_opacities.ndim == 2:
        logit_opacities = logit_opacities[:, 0]
    c = means.shape[0]
    noise = jax.random.normal(key, (c, 3), dtype=means.dtype)
    rot = quat_to_rotmat(quats)
    var = jnp.exp(2.0 * log_scales)
    # cov @ n = R @ (var * (R^T @ n)) — two matvecs, no [C,3,3] cov tensor
    t = jnp.sum(rot * noise[:, :, None], axis=1)  # R^T @ n
    transformed = jnp.sum(rot * (var * t)[:, None, :], axis=2)  # [C, 3]
    op = jax.nn.sigmoid(logit_opacities)
    gate = jax.nn.sigmoid(-(100.0 * op - 0.5))
    factor = current_lr * gate
    # select (not multiply-by-zero): inactive slots must stay untouched even
    # if their degenerate params make `transformed` non-finite (0*inf = NaN)
    return jnp.where(active[:, None], means + factor[:, None] * transformed, means)
