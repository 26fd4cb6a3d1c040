"""Unit tests for quaternion/covariance math (parity bar:
reference tests/test_basic.cpp covariance sections + torch_impl oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat, quat_scale_to_cov3d


def _rotmat_np(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (w * y + x * z)],
            [2 * (w * z + x * y), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (w * x + y * z), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_quat_identity():
    r = quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-6)


def test_quat_matches_reference_formula(rng):
    q = rng.normal(0, 1, (32, 4)).astype(np.float32)
    r = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    for i in range(32):
        np.testing.assert_allclose(r[i], _rotmat_np(q[i]), atol=1e-5)


def test_quat_scale_invariance(rng):
    """Unnormalized quaternions give the same rotation as normalized ones."""
    q = rng.normal(0, 1, (8, 4)).astype(np.float32)
    r1 = quat_to_rotmat(jnp.asarray(q))
    r2 = quat_to_rotmat(jnp.asarray(3.7 * q))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_cov3d_psd_and_eigvals(rng):
    q = rng.normal(0, 1, (16, 4)).astype(np.float32)
    s = rng.uniform(-2, 0.5, (16, 3)).astype(np.float32)
    cov = np.asarray(quat_scale_to_cov3d(jnp.asarray(q), jnp.asarray(s)))
    for i in range(16):
        np.testing.assert_allclose(cov[i], cov[i].T, atol=1e-6)
        eig = np.sort(np.linalg.eigvalsh(cov[i]))
        np.testing.assert_allclose(eig, np.sort(np.exp(2 * s[i])), rtol=1e-4)


def test_cov3d_gradients_finite_diff(rng):
    q = jnp.asarray(rng.normal(0, 1, (4,)).astype(np.float32))
    s = jnp.asarray(rng.uniform(-1, 0, (3,)).astype(np.float32))

    def f(q, s):
        return jnp.sum(quat_scale_to_cov3d(q, s) ** 2)

    g_q, g_s = jax.grad(f, argnums=(0, 1))(q, s)
    eps = 1e-3
    for i in range(4):
        dq = jnp.zeros(4).at[i].set(eps)
        fd = (f(q + dq, s) - f(q - dq, s)) / (2 * eps)
        np.testing.assert_allclose(g_q[i], fd, rtol=2e-2, atol=1e-3)
    for i in range(3):
        ds = jnp.zeros(3).at[i].set(eps)
        fd = (f(q, s + ds) - f(q, s - ds)) / (2 * eps)
        np.testing.assert_allclose(g_s[i], fd, rtol=2e-2, atol=1e-3)
