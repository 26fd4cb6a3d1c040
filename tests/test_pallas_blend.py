"""Pallas blend kernel vs oracle — forward image/alpha and full input
gradients (parity bar: reference test_rasterization.cpp backend
cross-validation + test_numerical_gradients.cpp). Runs in Pallas interpreter
mode on CPU; compiled on TPU.

Tolerances: the fast path streams COLORS as bf16 (kernels/blend_pallas.py),
so images match the f32 oracle to ~0.4% of color magnitude (~2.5e-3) — a
53 dB error floor, far beyond the 0.1 dB parity budget; geometry stays f32
and alpha/transmittance are color-independent (exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.ops.rasterize import rasterize
from tests.scene_utils import make_camera, make_random_splats

KW = dict(instance_cap=4096, k_max=128)


def test_pallas_matches_oracle_forward(rng):
    cam = make_camera(48, 32)
    splats = make_random_splats(rng, n=64)
    bg = jnp.array([0.2, 0.1, 0.4])
    out_o = rasterize(splats, cam.device_params(), bg, mode="oracle")
    out_p = rasterize(splats, cam.device_params(), bg, mode="pallas", **KW)
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_o.image), atol=4e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_p.alpha), np.asarray(out_o.alpha), atol=5e-5
    )


def test_pallas_deep_tile_early_termination(rng):
    """Stack many near-opaque gaussians on one tile: early termination and
    multi-chunk streaming must still match the oracle."""
    cam = make_camera(32, 32)
    n = 300  # > CHUNK when all land in the same tiles
    splats = make_random_splats(
        rng, n=n, spread=0.25, opacity_range=(0.85, 0.99)
    )
    bg = jnp.zeros(3)
    out_o = rasterize(splats, cam.device_params(), bg, mode="oracle")
    out_p = rasterize(splats, cam.device_params(), bg, mode="pallas", instance_cap=8192, k_max=512)
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_o.image), atol=5e-3
    )


def test_pallas_gradients_match_oracle(rng):
    cam = make_camera(32, 32)
    splats = make_random_splats(rng, n=32)
    bg = jnp.zeros(3)
    target = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))

    def loss(params, mode):
        s = splats.replace_trainable(params)
        out = rasterize(s, cam.device_params(), bg, mode=mode, **KW)
        return jnp.mean((out.image - target) ** 2)

    p = splats.trainable_dict()
    g_o = jax.grad(lambda q: loss(q, "oracle"))(p)
    g_p = jax.grad(lambda q: loss(q, "pallas"))(p)
    for k in p:
        a, b = np.asarray(g_p[k]), np.asarray(g_o[k])
        assert np.isfinite(a).all(), k
        # bf16 color streaming perturbs geometry grads by ~0.4% of the
        # color-dependent terms (straight-through quantizer)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-5, err_msg=k)


def test_pallas_gradients_deep_unaligned(rng):
    """Multi-chunk backward over the COMPACT (unaligned-start) layout:
    deep tiles force several streamed chunks per tile plus early-termination
    zero-fill, and adjacent tiles share boundary chunks, so this exercises
    the sequential read-merge-write boundary handling in the replay kernel
    (kernels/blend_pallas.py::_backward_kernel, aligned=False)."""
    cam = make_camera(64, 32)
    n = 400  # > chunk instances landing on a handful of tiles
    splats = make_random_splats(rng, n=n, spread=0.5, opacity_range=(0.6, 0.95))
    bg = jnp.zeros(3)
    target = jnp.asarray(rng.uniform(0, 1, (32, 64, 3)).astype(np.float32))

    def loss(params, mode):
        s = splats.replace_trainable(params)
        out = rasterize(s, cam.device_params(), bg, mode=mode,
                        instance_cap=8192, k_max=512)
        return jnp.mean((out.image - target) ** 2)

    p = splats.trainable_dict()
    g_o = jax.grad(lambda q: loss(q, "oracle"))(p)
    g_p = jax.grad(lambda q: loss(q, "pallas"))(p)
    for k in p:
        a, b = np.asarray(g_p[k]), np.asarray(g_o[k])
        assert np.isfinite(a).all(), k
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=3e-5, err_msg=k)


def test_pallas_depth_mode(rng):
    cam = make_camera(32, 32)
    splats = make_random_splats(rng, n=24)
    bg = jnp.zeros(3)
    out_o = rasterize(splats, cam.device_params(), bg, mode="oracle", with_depth=True)
    out_p = rasterize(splats, cam.device_params(), bg, mode="pallas", with_depth=True, **KW)
    # depth rides the bf16 aux channel: ~0.4% of depth magnitude
    np.testing.assert_allclose(
        np.asarray(out_p.depth), np.asarray(out_o.depth),
        atol=2e-2 * float(np.abs(np.asarray(out_o.depth)).max() + 1)
    )


def test_pallas_inference_layout_matches_oracle(rng):
    """inference=True uses the compact (unaligned-start) layout — the
    forward kernel's aligned-window DMA + prefix masking must reproduce the
    oracle image exactly like the training layout does."""
    cam = make_camera(48, 32)
    splats = make_random_splats(rng, n=96)
    bg = jnp.array([0.2, 0.1, 0.4])
    out_o = rasterize(splats, cam.device_params(), bg, mode="oracle")
    out_p = rasterize(
        splats, cam.device_params(), bg, mode="pallas", inference=True, **KW
    )
    np.testing.assert_allclose(
        np.asarray(out_p.image), np.asarray(out_o.image), atol=4e-3
    )
    # inference drops the per-pixel transmittance freeze (freeze=False) AND
    # terminates its chunk walk at INFERENCE_TERM_THRESHOLD (1/512, the
    # u8-invisible cut): a pixel may stop with up to that much residual
    # transmittance unaccumulated, so that constant is the alpha bound
    from lichtfeld_studio_tpu.kernels.blend_pallas import INFERENCE_TERM_THRESHOLD

    np.testing.assert_allclose(
        np.asarray(out_p.alpha), np.asarray(out_o.alpha),
        atol=INFERENCE_TERM_THRESHOLD,
    )


def test_grad_skip_eps_trim_bound(rng, monkeypatch):
    """Regression bound for the backward tail trim (GRAD_SKIP_EPS).

    The trim criterion is WEIGHT-based: the forward records each chunk's
    max blending weight max_p(T_entry - T_exit) and the backward stops at
    the last chunk with a bound >= eps. This is STRICTER than the
    reference's contribution-count gate (fastgs kernels_backward.cuh:276
    replays to the last fragment with alpha >= 1/255 regardless of its
    transmittance), so a late high-alpha fragment under low transmittance
    gets zero gradient here but a real (tiny) one in the reference. This
    test pins the trimmed-vs-exact delta on a deep multi-chunk scene whose
    transmittance decays slowly through the [1e-4, 1/255) band where the
    trim actually bites.

    Bound: each pixel's weights sum to <= 1 and every trimmed weight is
    < eps, so the dropped gradient mass per pixel is < eps of its total;
    in parameter space that is <= eps * ||g||_inf per group, with a 4x
    safety factor for the conic moment recombination (which amplifies by
    ~tile_radius^2 / sigma^2 on the trimmed rows)."""
    from lichtfeld_studio_tpu.kernels import blend_pallas

    cam = make_camera(32, 32)
    # ~500 moderate-alpha gaussians with footprints MUCH larger than the
    # image (sigma ~ 75 px), so alpha ~ opacity uniformly and EVERY pixel's
    # transmittance decays ~ (1-0.05)^k: the per-chunk weight bound
    # max_p(T_entry - T_exit) falls below 1/255 at chunk 1 (T ~ 1.4e-3
    # after 128) while the forward still walks into chunk 1 until the 1e-4
    # termination (k ~ 180) — the trim band is genuinely exercised
    splats = make_random_splats(
        rng, n=512, spread=0.05, opacity_range=(0.045, 0.055)
    )
    params0 = splats.trainable_dict()
    splats = splats.replace_trainable(
        dict(params0, scaling=jnp.full_like(params0["scaling"], jnp.log(5.0)))
    )
    bg = jnp.zeros(3)
    target = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))

    def loss(params):
        s = splats.replace_trainable(params)
        out = rasterize(
            s, cam.device_params(), bg, mode="pallas",
            instance_cap=8192, k_max=512,
        )
        return jnp.sum(jnp.abs(out.image - target))

    params = splats.trainable_dict()
    monkeypatch.setattr(blend_pallas, "GRAD_SKIP_EPS", 0.0)
    g_exact = jax.grad(loss)(params)
    monkeypatch.setattr(blend_pallas, "GRAD_SKIP_EPS", 1.0 / 255.0)
    g_trim = jax.grad(loss)(params)

    saw_difference = False
    for k in g_exact:
        e = np.asarray(g_exact[k])
        t = np.asarray(g_trim[k])
        scale = max(np.abs(e).max(), 1e-6)
        err = np.abs(t - e).max()
        assert err <= 4.0 * (1.0 / 255.0) * scale, (
            f"group {k}: trim error {err:.3e} exceeds bound "
            f"{4.0/255.0 * scale:.3e}"
        )
        saw_difference = saw_difference or err > 0.0
    # the scene must actually exercise the trim, or the bound is vacuous
    assert saw_difference, "trim never engaged — scene too shallow"
