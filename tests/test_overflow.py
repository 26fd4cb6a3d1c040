"""Instance-cap overflow and deep-tile robustness (VERDICT r1 item 9).

Overflow policy under test (ops/tiles.py): beyond instance_cap, trailing
instances (gaussian order) are dropped for the step, n_instances still
reports the true total so the trainer can warn and grow, and the rendered
image stays finite and correct for the kept prefix. Deep tiles: the tiles
fallback truncates at k_max (back-most dropped); the pallas path streams the
full list."""

import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.ops.projection import project_gaussians
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.ops.tiles import build_tile_assignment
from tests.scene_utils import make_camera, make_random_splats


def _proj(splats, cam, W, H):
    return project_gaussians(
        splats.means, splats.scaling, splats.rotation, splats.opacity,
        splats.sh0, splats.shN, splats.active_mask(), splats.active_sh_degree,
        jnp.asarray(cam.w2c), jnp.asarray(cam.cam_position),
        jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32),
        width=W, height=H,
    )


def test_overflow_reports_true_total_and_stays_correct(rng):
    W, H = 64, 48
    splats = make_random_splats(rng, n=96, spread=1.0)
    cam = make_camera(W, H)
    proj = _proj(splats, cam, W, H)
    total = int(np.asarray(proj.n_touched).sum())
    assert total > 64

    big = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="tiles",
                    instance_cap=4 * total, k_max=128)
    exact = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="tiles",
                      instance_cap=total, k_max=128)
    # cap == true total: no drops, bit-comparable rendering
    assert int(exact.n_instances) == total
    np.testing.assert_allclose(
        np.asarray(exact.image), np.asarray(big.image), atol=1e-5
    )

    # cap < total: true count still reported (the trainer's grow signal),
    # output stays finite, and the kept prefix renders deterministically
    small = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="tiles",
                      instance_cap=total - 16, k_max=128)
    assert int(small.n_instances) == total  # not clamped to the cap
    img = np.asarray(small.image)
    assert np.isfinite(img).all()
    small2 = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="tiles",
                       instance_cap=total - 16, k_max=128)
    np.testing.assert_array_equal(img, np.asarray(small2.image))


def test_overflow_binning_invariants(rng):
    """At cap < total: kept instances are exactly the expansion-order prefix
    and every layout invariant still holds."""
    W, H = 64, 48
    splats = make_random_splats(rng, n=96, spread=1.0)
    cam = make_camera(W, H)
    proj = _proj(splats, cam, W, H)
    total = int(np.asarray(proj.n_touched).sum())
    cap = total - 10
    a = build_tile_assignment(proj, grid_w=4, grid_h=3, instance_cap=cap)
    assert int(a.n_instances) == total
    n_kept = int(np.asarray(a.instance_valid).sum())
    assert n_kept == cap
    # every slot id appears exactly once in slot_layout (gradient contract)
    sl = np.sort(np.asarray(a.slot_layout))
    np.testing.assert_array_equal(sl, np.arange(cap))


def test_overflow_pallas_interpret_matches_tiles(rng):
    W, H = 48, 32
    splats = make_random_splats(rng, n=80, spread=0.9)
    cam = make_camera(W, H)
    proj = _proj(splats, cam, W, H)
    total = int(np.asarray(proj.n_touched).sum())
    cap = total - 8
    t = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="tiles",
                  instance_cap=cap, k_max=256)
    p = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="pallas",
                  instance_cap=cap)
    err = np.abs(np.asarray(t.image) - np.asarray(p.image))
    assert np.isfinite(np.asarray(p.image)).all()
    assert np.median(err) < 3e-3, np.median(err)


def test_deep_tile_truncation_is_backmost_only(rng):
    """k_max truncation on the tiles path must drop only the BACK-most
    instances (those early termination would skip): with an opaque front,
    truncation must not change the image."""
    W, H = 32, 32
    n = 64
    splats = make_random_splats(rng, n=n, spread=0.05,
                                opacity_range=(0.93, 0.99))
    # big footprints so the front ~10 gaussians saturate every center pixel
    splats = splats.replace_trainable(
        {**splats.trainable_dict(),
         "scaling": jnp.full_like(splats.scaling, float(np.log(0.5)))}
    )
    cam = make_camera(W, H)
    full = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="tiles",
                     instance_cap=4096, k_max=n)
    trunc = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="tiles",
                      instance_cap=4096, k_max=24)
    got = np.asarray(trunc.image)
    want = np.asarray(full.image)
    # center pixels saturate within ~10 gaussians at 0.95 opacity
    cy, cx = H // 2, W // 2
    np.testing.assert_allclose(
        got[cy - 4 : cy + 4, cx - 4 : cx + 4],
        want[cy - 4 : cy + 4, cx - 4 : cx + 4],
        atol=1e-3,
    )
    # pallas streams the full depth: must match the untruncated render
    p = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="pallas",
                  instance_cap=4096)
    err = np.abs(np.asarray(p.image) - want)
    assert np.median(err) < 3e-3
