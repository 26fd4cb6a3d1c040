"""Oracle rasterizer semantics tests (parity bar: reference
test_rasterization.cpp edge cases; blend semantics of kernels_forward.cuh
blend_cu)."""

import jax
import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.ops.blend_ref import blend_along_axis, compute_alphas, rasterize_oracle
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from tests.scene_utils import make_camera, make_random_splats


def test_single_gaussian_center_alpha():
    """alpha at the gaussian center pixel = opacity (G=1); color = T*alpha*c."""
    mean2d = jnp.array([[8.5, 8.5]])  # exactly a pixel center
    conic = jnp.array([[0.5, 0.0, 0.5]])
    opacity = jnp.array([0.7])
    color = jnp.array([[0.2, 0.4, 0.6]])
    depth = jnp.array([1.0])
    valid = jnp.array([True])
    img, alpha = rasterize_oracle(
        mean2d, conic, opacity, color, depth, valid, width=16, height=16
    )
    np.testing.assert_allclose(np.asarray(alpha[8, 8]), 0.7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img[8, 8]), 0.7 * np.array([0.2, 0.4, 0.6]), atol=1e-6)


def test_occlusion_order():
    """A front opaque gaussian hides a back one regardless of array order."""
    mean2d = jnp.array([[8.5, 8.5], [8.5, 8.5]])
    conic = jnp.tile(jnp.array([[2.0, 0.0, 2.0]]), (2, 1))
    opacity = jnp.array([0.999, 0.999])
    color = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    depth = jnp.array([5.0, 1.0])  # second is in front
    valid = jnp.array([True, True])
    img, _ = rasterize_oracle(mean2d, conic, opacity, color, depth, valid, width=16, height=16)
    px = np.asarray(img[8, 8])
    assert px[1] > 0.99 and px[0] < 0.01  # green in front


def test_alpha_clamp_and_skip():
    """alpha is clamped to 0.999 and sub-1/255 contributions are skipped."""
    a = compute_alphas(
        jnp.array([[0.5, 0.5]]),
        jnp.array([[0.1, 0.0, 0.1]]),
        jnp.array([1.0 - 1e-9]),
        jnp.array([0.5]),
        jnp.array([0.5]),
    )
    np.testing.assert_allclose(np.asarray(a)[0, 0], 0.999, atol=1e-6)
    a2 = compute_alphas(
        jnp.array([[0.5, 0.5]]),
        jnp.array([[0.1, 0.0, 0.1]]),
        jnp.array([0.003]),  # below 1/255
        jnp.array([0.5]),
        jnp.array([0.5]),
    )
    assert float(a2[0, 0]) == 0.0


def test_early_termination():
    """After transmittance drops below 1e-4, later gaussians contribute 0."""
    k = 8
    alphas = jnp.full((k, 1), 0.9)  # T after i: 0.1^i -> crosses 1e-4 at i=4
    colors = jnp.ones((k, 3))
    out, t = blend_along_axis(alphas, colors)
    # contributions: i=0..3 counted (T reaches 1e-4 exactly at i=4 -> skipped)
    w_expected = sum(0.9 * 0.1**i for i in range(4))
    np.testing.assert_allclose(np.asarray(out)[0, 0], w_expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t)[0], 1e-4, rtol=1e-4)


def test_background_composite(rng):
    cam = make_camera(32, 32)
    splats = make_random_splats(rng, n=0, capacity=4)
    bg = jnp.array([0.1, 0.2, 0.3])
    out = rasterize(splats, cam.device_params(), bg, mode="oracle")
    np.testing.assert_allclose(np.asarray(out.image[0, 0]), [0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.alpha), 0.0, atol=1e-6)


def test_gradients_flow(rng):
    cam = make_camera(32, 24)
    splats = make_random_splats(rng, n=16)

    def loss_fn(means):
        s = splats.replace_trainable({**splats.trainable_dict(), "means": means})
        out = rasterize(s, cam.device_params(), jnp.zeros(3), mode="oracle")
        return jnp.sum(out.image**2)

    g = jax.grad(loss_fn)(splats.means)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
