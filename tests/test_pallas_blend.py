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
    # inference drops the per-pixel transmittance freeze (freeze=False):
    # alpha may keep decaying past the 1e-4 threshold instead of freezing
    # at it, so the bound is TRANSMITTANCE_THRESHOLD, not exactness
    np.testing.assert_allclose(
        np.asarray(out_p.alpha), np.asarray(out_o.alpha), atol=1.5e-4
    )
