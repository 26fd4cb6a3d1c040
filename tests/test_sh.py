"""SH evaluation tests (parity bar: reference test_basic.cpp SH sections +
kernel_utils.cuh convert_sh_to_color constants)."""

import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.ops.sh import SH_C0, eval_sh_bases, sh_to_color


def test_dc_only():
    sh0 = jnp.ones((4, 1, 3)) * 0.7
    shN = jnp.zeros((4, 15, 3))
    means = jnp.array([[0.0, 0.0, 5.0]] * 4)
    cam = jnp.zeros(3)
    c = sh_to_color(sh0, shN, means, cam, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(c), 0.5 + SH_C0 * 0.7, atol=1e-6)


def test_degree_masking(rng):
    """Degree 0 must ignore shN entirely; higher degrees change the color."""
    n = 8
    sh0 = jnp.asarray(rng.normal(0, 1, (n, 1, 3)).astype(np.float32))
    shN = jnp.asarray(rng.normal(0, 1, (n, 15, 3)).astype(np.float32))
    means = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32) + np.array([0, 0, 5]))
    cam = jnp.zeros(3)
    c0 = sh_to_color(sh0, jnp.zeros_like(shN), means, cam, jnp.asarray(3))
    c0_masked = sh_to_color(sh0, shN, means, cam, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c0_masked), atol=1e-6)
    c3 = sh_to_color(sh0, shN, means, cam, jnp.asarray(3))
    assert not np.allclose(np.asarray(c3), np.asarray(c0_masked))


def test_degree1_analytic(rng):
    """Degree-1 term along +z: color += 0.4886 * z * coeff[1]."""
    sh0 = jnp.zeros((1, 1, 3))
    shN = jnp.zeros((1, 15, 3)).at[0, 1, :].set(1.0)
    means = jnp.array([[0.0, 0.0, 2.0]])
    cam = jnp.zeros(3)
    c = sh_to_color(sh0, shN, means, cam, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(c)[0], 0.5 + 0.48860251190291987, atol=1e-6)


def test_bases_orthonormal_montecarlo(rng):
    """Real spherical harmonics are orthonormal over the sphere:
    E_uniform[b_i b_j] = delta_ij / (4 pi). Validates every constant through
    degree 4 in one shot (incl. the deg-4 set from gsplat's kernel)."""
    n = 400_000
    v = rng.normal(0, 1, (n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    b = np.asarray(eval_sh_bases(jnp.asarray(v.astype(np.float32))))  # [n, 24]
    gram = (b.T @ b) / n
    expected = np.eye(24) / (4.0 * np.pi)
    np.testing.assert_allclose(gram, expected, atol=6e-4)
    # DC term too: C0^2 = 1/(4 pi)
    np.testing.assert_allclose(SH_C0**2, 1.0 / (4 * np.pi), rtol=1e-12)


def test_bases_unit_dirs():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    b = np.asarray(eval_sh_bases(d))
    # +z: only z-dependent bases nonzero
    np.testing.assert_allclose(b[0, 0], 0.0, atol=1e-7)  # -C1*y
    np.testing.assert_allclose(b[0, 1], 0.48860251190291987, atol=1e-7)  # C1*z
    # basis 5: 0.9462*zz - 0.3154
    np.testing.assert_allclose(b[0, 5], 0.94617469575755997 - 0.31539156525251999, atol=1e-6)
    # +x: -C1*x basis
    np.testing.assert_allclose(b[1, 2], -0.48860251190291987, atol=1e-7)
