"""Frame-coherent renderer: stale-bin reuse must match exact renders for
nearby cameras (within u8 tolerance) and re-bin on large motion."""

import numpy as np
import jax.numpy as jnp

from lichtfeld_studio_tpu.core.camera import look_at_camera
from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.render.coherent import CoherentRenderer

W = H = 64
N = 400


def _scene():
    rng = np.random.default_rng(3)
    pos = rng.normal(0, 0.8, (N, 3)).astype(np.float32)
    col = rng.uniform(0.1, 0.9, (N, 3)).astype(np.float32)
    s = SplatData.from_point_cloud(pos, col, np.zeros(3, np.float32), capacity=N)
    return s.replace_trainable({
        **s.trainable_dict(),
        "opacity": jnp.full((N, 1), 1.5),
        "scaling": jnp.full((N, 3), float(np.log(0.06))),
    })


def _cam(theta):
    eye = 4.0 * np.array([np.sin(theta), -0.2, -np.cos(theta)])
    return look_at_camera(eye, np.zeros(3), np.array([0.0, -1.0, 0.0]),
                          fx=60.0, fy=60.0, width=W, height=H)


def _exact_u8(splats, cam):
    out = rasterize(splats, cam.device_params(), jnp.zeros(3),
                    mode="pallas", tile_size=32, instance_cap=4096,
                    inference=True)
    return np.asarray(
        jnp.clip(out.image * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    ).astype(np.int32)


def test_coherent_matches_exact_nearby():
    splats = _scene()
    r = CoherentRenderer(W, H, tile_size=32, instance_cap=4096, dilate_px=6.0)
    # a slow orbit: per-frame drift well under the budget at fx=60
    thetas = [0.0, 0.002, 0.004, 0.006]
    for th in thetas:
        img = r.render(splats, _cam(th)).astype(np.int32)
        exact = _exact_u8(splats, _cam(th))
        # current-frame geometry with stale (dilated) lists: only blend
        # ORDER can deviate, bounded by a few u8 steps on edge pixels
        diff = np.abs(img - exact)
        assert np.median(diff) <= 1, np.median(diff)
        assert (diff <= 3).mean() > 0.99, (diff.max(), (diff > 3).mean())
    assert r.stats["bins"] == 1, r.stats  # all frames reused one binning
    assert r.stats["frames"] == len(thetas)


def test_rebin_on_large_motion_and_model_change():
    splats = _scene()
    r = CoherentRenderer(W, H, tile_size=32, instance_cap=4096, dilate_px=6.0)
    r.render(splats, _cam(0.0))
    r.render(splats, _cam(0.8))  # ~0.8 rad: far past the drift budget
    assert r.stats["bins"] == 2, r.stats
    img_far = r.render(splats, _cam(0.8))
    exact = _exact_u8(splats, _cam(0.8))
    assert (np.abs(img_far.astype(np.int32) - exact) <= 3).mean() > 0.99
    # model identity change forces a re-bin
    splats2 = _scene()
    r.render(splats2, _cam(0.8))
    assert r.stats["bins"] == 3, r.stats
