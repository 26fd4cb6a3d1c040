"""Numerical gradient checks of the full differentiable rasterizer — the
analog of the reference's parity bar suite (tests/test_numerical_gradients.cpp:
finite-difference checks of quat-scale-covar, SH, projection, and the full
pipeline; named in BASELINE.json configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.ops.projection import project_gaussians
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.ops.sh import sh_to_color
from tests.scene_utils import make_camera, make_random_splats

KW = dict(mode="tiles", instance_cap=2048, k_max=64)


def _loss_fn(splats, cam, target, params):
    s = splats.replace_trainable(params)
    out = rasterize(s, cam.device_params(), jnp.zeros(3), **KW)
    return jnp.mean((out.image - target) ** 2)


@pytest.mark.slow
def test_full_pipeline_directional_derivative(rng):
    """Directional derivative of the full render loss vs central differences
    for every parameter group."""
    cam = make_camera(32, 32)
    splats = make_random_splats(rng, n=12)
    target = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    params = splats.trainable_dict()

    loss = lambda p: _loss_fn(splats, cam, target, p)
    grads = jax.grad(loss)(params)

    for k in params:
        key = np.random.default_rng(sum(ord(c) for c in k))
        d = jnp.asarray(key.normal(0, 1, params[k].shape).astype(np.float32))
        # keep the perturbation off the discrete mask boundaries
        eps = 1e-3 if k in ("means", "scaling") else 3e-3
        analytic = float(jnp.sum(grads[k] * d))
        p_plus = {**params, k: params[k] + eps * d}
        p_minus = {**params, k: params[k] - eps * d}
        fd = (float(loss(p_plus)) - float(loss(p_minus))) / (2 * eps)
        denom = max(abs(analytic), abs(fd), 1e-5)
        rel = abs(analytic - fd) / denom
        # geometry perturbations (means/rotation/scaling all move the conic)
        # flip discrete masks (tile membership, alpha skip, termination) that
        # central differences see but the analytic gradient correctly ignores
        # (exact gradient parity vs the oracle autodiff is asserted in
        # test_tiles_pipeline / test_pallas_blend); tolerance philosophy
        # matches the reference suite's per-test epsilons
        # (test_numerical_gradients.cpp)
        tol = 0.2 if k in ("means", "rotation", "scaling", "opacity") else 0.08
        assert rel < tol, f"{k}: analytic {analytic:.6g} vs fd {fd:.6g} (rel {rel:.3f})"


def test_sh_gradients_finite_diff(rng):
    means = jnp.asarray(rng.normal(0, 1, (4, 3)).astype(np.float32) + np.array([0, 0, 5]))
    sh0 = jnp.asarray(rng.normal(0, 0.3, (4, 1, 3)).astype(np.float32))
    shN = jnp.asarray(rng.normal(0, 0.1, (4, 15, 3)).astype(np.float32))
    cam = jnp.zeros(3)

    def f(sh0, shN, means):
        return jnp.sum(sh_to_color(sh0, shN, means, cam, jnp.asarray(3)) ** 2)

    g0, gN, gm = jax.grad(f, argnums=(0, 1, 2))(sh0, shN, means)
    eps = 1e-3
    for arr, g, name in ((sh0, g0, "sh0"), (shN, gN, "shN"), (means, gm, "means")):
        d = jnp.asarray(np.random.default_rng(1).normal(0, 1, arr.shape).astype(np.float32))
        analytic = float(jnp.sum(g * d))
        fd = (float(f(*[a + eps * d if a is arr else a for a in (sh0, shN, means)]))
              - float(f(*[a - eps * d if a is arr else a for a in (sh0, shN, means)]))) / (2 * eps)
        assert abs(analytic - fd) / max(abs(fd), 1e-6) < 0.02, name


def test_projection_gradients_finite_diff(rng):
    """EWA projection outputs (mean2d, conic, depth) vs finite differences of
    means and log-scales."""
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=6)

    def f(means, scaling):
        p = project_gaussians(
            means, scaling, splats.rotation, splats.opacity, splats.sh0,
            splats.shN, splats.active_mask(), splats.active_sh_degree,
            jnp.asarray(cam.w2c), jnp.asarray(cam.cam_position),
            jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32),
            width=64, height=48,
        )
        w = jnp.where(p.valid[:, None], 1.0, 0.0)
        return jnp.sum(w * p.mean2d) + 10.0 * jnp.sum(w * p.conic) + jnp.sum(
            jnp.where(p.valid, p.depth, 0.0)
        )

    gm, gs = jax.grad(f, argnums=(0, 1))(splats.means, splats.scaling)
    rng2 = np.random.default_rng(3)
    for arr, g in ((splats.means, gm), (splats.scaling, gs)):
        d = jnp.asarray(rng2.normal(0, 1, arr.shape).astype(np.float32))
        eps = 1e-4
        a_plus = [splats.means, splats.scaling]
        a_minus = [splats.means, splats.scaling]
        idx = 0 if arr is splats.means else 1
        a_plus[idx] = arr + eps * d
        a_minus[idx] = arr - eps * d
        fd = (float(f(*a_plus)) - float(f(*a_minus))) / (2 * eps)
        analytic = float(jnp.sum(g * d))
        assert abs(analytic - fd) / max(abs(fd), 1e-4) < 0.02
