"""Quaternion / covariance math for 3D Gaussians.

Numerical semantics follow the reference CUDA preprocess
(fastgs/rasterization/include/kernels_forward.cuh:76-105): rotation is built
from the *unnormalized* wxyz quaternion via division by |q|^2, variance is
exp(2 * log_scale), and cov3d = R diag(var) R^T. Everything is plain
vectorized jnp — XLA fuses this elementwise chain into the surrounding
kernels; there is no benefit to a hand-written Pallas kernel here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rotmat(quat: jnp.ndarray, eps: float = 1e-24) -> jnp.ndarray:
    """[..., 4] wxyz (unnormalized) -> [..., 3, 3] rotation matrix.

    Equivalent to normalizing the quaternion first; degenerate |q|~0 inputs
    produce garbage and must be masked by the caller (the reference culls
    |q|^2 < 1e-8, kernels_forward.cuh:81-83)."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    n = jnp.maximum(w * w + x * x + y * y + z * z, eps)
    s = 2.0 / n
    xx, yy, zz = s * x * x, s * y * y, s * z * z
    xy, xz, yz = s * x * y, s * x * z, s * y * z
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    r = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, wy + xz,
            wz + xy, 1.0 - (xx + zz), yz - wx,
            xz - wy, wx + yz, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(quat.shape[:-1] + (3, 3))


def quat_scale_to_cov3d(quat: jnp.ndarray, log_scale: jnp.ndarray) -> jnp.ndarray:
    """(quat [...,4], log_scale [...,3]) -> cov3d [...,3,3] = R diag(e^{2s}) R^T.

    Written as explicit component sums rather than matmuls: tiny 3x3
    contractions gain nothing from the MXU, and JAX's default matmul
    precision (bf16 passes) loses ~1e-3 here, which is fatal for EWA
    projection gradients. The VPU evaluates this at full f32."""
    rot = quat_to_rotmat(quat)
    var = jnp.exp(2.0 * log_scale)
    m = rot * var[..., None, :]  # R @ diag(var)
    # cov_ij = sum_k m_ik * rot_jk, exactly symmetric by construction
    cov = jnp.einsum("...ik,...jk->...ij", m, rot, precision=jax.lax.Precision.HIGHEST)
    return cov
