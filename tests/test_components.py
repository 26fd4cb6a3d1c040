"""Component tests: bilateral grid, pose optimization, background
modulation, ADMM sparsity (parity bars: reference bilateral_grid kernels,
poseopt.cpp, trainer.cpp bg modulation, sparsity_optimizer.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.train.components.background import (
    background_for_step,
    inv_weight_piecewise,
)
from lichtfeld_studio_tpu.train.components.bilateral_grid import (
    apply_bilateral_grid,
    identity_grids,
    slice_grid,
    tv_loss,
    warmup_exponential_lr,
)
from lichtfeld_studio_tpu.train.components.poseopt import (
    apply_pose_opt,
    init_pose_params,
    rotation_6d_to_matrix,
)
from lichtfeld_studio_tpu.train.components import sparsity


# ---------------------------------------------------------------- bilateral
def test_identity_grid_is_noop(rng):
    grids = identity_grids(2)
    rgb = jnp.asarray(rng.uniform(0, 1, (24, 32, 3)).astype(np.float32))
    out = apply_bilateral_grid(grids, rgb, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-5)


def test_identity_grid_tv_zero():
    assert float(tv_loss(identity_grids(3))) == 0.0


def test_grid_gradients_flow(rng):
    grids = identity_grids(1)
    rgb = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))

    def loss(g):
        return jnp.mean((slice_grid(g[0], rgb) - tgt) ** 2) + tv_loss(g)

    g = jax.grad(loss)(grids)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_warmup_lr_schedule():
    lr0 = float(warmup_exponential_lr(1.0, jnp.asarray(0), 30000))
    lr_w = float(warmup_exponential_lr(1.0, jnp.asarray(1000), 30000))
    lr_end = float(warmup_exponential_lr(1.0, jnp.asarray(30000), 30000))
    assert abs(lr0 - 0.01) < 1e-6
    assert abs(lr_w - 1.0) < 1e-3
    assert abs(lr_end - 0.01) < 1e-3


# ---------------------------------------------------------------- pose opt
def test_rotation_6d_identity():
    r = rotation_6d_to_matrix(jnp.asarray([1.0, 0, 0, 0, 1, 0]))
    np.testing.assert_allclose(np.asarray(r), np.eye(3), atol=1e-6)


def test_pose_zero_init_is_identity(rng):
    w2c = jnp.asarray(np.eye(4, dtype=np.float32).at if False else np.eye(4, dtype=np.float32))
    w2c = w2c.at[0, 3].set(2.0)
    for mode in ("direct", "mlp"):
        params = init_pose_params(mode, 4)
        out = apply_pose_opt(mode, params, w2c, jnp.asarray(2))
        np.testing.assert_allclose(np.asarray(out), np.asarray(w2c), atol=1e-6)


def test_pose_direct_translation():
    params = init_pose_params("direct", 2)
    params["embeddings"] = params["embeddings"].at[1, 0].set(0.5)  # dx
    w2c = jnp.eye(4)
    out = apply_pose_opt("direct", params, w2c, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(out[:3, 3]), [0.5, 0, 0], atol=1e-6)


# ---------------------------------------------------------------- background
def test_bg_schedule_piecewise():
    assert float(inv_weight_piecewise(jnp.asarray(0), 100)) == 1.0
    assert abs(float(inv_weight_piecewise(jnp.asarray(37), 100)) - 0.76) < 0.01
    assert float(inv_weight_piecewise(jnp.asarray(80), 100)) <= 0.0 + 1e-6


def test_bg_modulation_bounds():
    bg = jnp.zeros(3)
    for it in (1, 100, 5000):
        out = background_for_step(bg, jnp.asarray(it), jax.random.PRNGKey(it), 30000, True)
        v = np.asarray(out)
        assert (v >= 0).all() and (v <= 1).all()


# ---------------------------------------------------------------- ssim ref
def test_ssim_matches_scipy_reference(rng):
    """Pin SSIM semantics against a direct scipy implementation (same
    windows, valid padding) — guards the precision of the conv path."""
    from scipy.ndimage import convolve1d

    from lichtfeld_studio_tpu.ops.ssim import ssim

    a = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    x = np.arange(11) - 5
    g = np.exp(-(x**2) / (2 * 1.5**2))
    g /= g.sum()

    def blur(img):
        out = convolve1d(img, g, axis=0, mode="constant")
        out = convolve1d(out, g, axis=1, mode="constant")
        return out[5:-5, 5:-5]

    c1, c2 = 0.01**2, 0.03**2
    mu1, mu2 = blur(a), blur(b)
    s1 = blur(a * a) - mu1 * mu1
    s2 = blur(b * b) - mu2 * mu2
    s12 = blur(a * b) - mu1 * mu2
    ref = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
           / ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))).mean()
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert ours <= 1.0 + 1e-5


# ---------------------------------------------------------------- sparsity
def test_admm_prune_z_zeros_smallest(rng):
    c = 16
    op_logit = jnp.asarray(rng.normal(0, 1, (c, 1)).astype(np.float32))
    active = jnp.ones(c, bool)
    n_active = jnp.asarray(c)
    st = sparsity.init_admm(op_logit, active, n_active, prune_ratio=0.5)
    z = np.asarray(st.z)
    assert (z == 0).sum() == 8
    opa = np.asarray(jax.nn.sigmoid(op_logit[:, 0]))
    # the zeroed ones are exactly the 8 smallest
    assert set(np.argsort(opa)[:8]) == set(np.nonzero(z == 0)[0])


def test_admm_loss_decreases_with_matching_opacity(rng):
    c = 8
    op_logit = jnp.asarray(rng.normal(0, 1, (c, 1)).astype(np.float32))
    active = jnp.ones(c, bool)
    st = sparsity.init_admm(op_logit, active, jnp.asarray(c), 0.25)
    l1 = float(sparsity.sparsity_loss(op_logit, active, st, rho=1.0))
    assert l1 > 0
    g = jax.grad(lambda o: sparsity.sparsity_loss(o, active, st, 1.0))(op_logit)
    assert np.isfinite(np.asarray(g)).all()


def test_prune_mask_fraction(rng):
    c = 20
    op_logit = jnp.asarray(rng.normal(0, 1, (c, 1)).astype(np.float32))
    active = jnp.ones(c, bool)
    m = sparsity.prune_mask(op_logit, active, jnp.asarray(c), 0.3)
    assert int(m.sum()) == 6
