"""Tile pipeline cross-validation: the sorted tile rasterizer must match the
dense oracle exactly-ish (parity bar: reference test_rasterization.cpp
CompareWithGSRasterize — two backends cross-checked against the oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.ops.projection import project_gaussians
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.ops.tiles import build_tile_assignment
from tests.scene_utils import make_camera, make_random_splats


def _proj(splats, cam):
    return project_gaussians(
        splats.means, splats.scaling, splats.rotation, splats.opacity,
        splats.sh0, splats.shN, splats.active_mask(), splats.active_sh_degree,
        jnp.asarray(cam.w2c), jnp.asarray(cam.cam_position),
        jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32),
        width=cam.width, height=cam.height,
    )


def test_assignment_counts_and_order(rng):
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=64)
    proj = _proj(splats, cam)
    for chunk in (1, 64):  # compact layout and the pallas chunk-aligned one
        asg = build_tile_assignment(
            proj, grid_w=4, grid_h=3, instance_cap=4096, chunk_align=chunk
        )
        n_inst = int(asg.n_instances)
        assert n_inst == int(np.asarray(proj.n_touched).sum())
        assert int(np.asarray(asg.instance_valid).sum()) == n_inst
        # per-tile instances must be depth sorted, ranges chunk-aligned
        g = np.asarray(asg.gaussian_idx)
        valid = np.asarray(asg.instance_valid)
        depth = np.asarray(proj.depth)
        starts, counts = np.asarray(asg.tile_start), np.asarray(asg.tile_count)
        assert counts.sum() == n_inst
        for t in range(12):
            assert starts[t] % chunk == 0
            sl = slice(starts[t], starts[t] + counts[t])
            assert valid[sl].all()
            d = depth[g[sl]]
            assert np.all(np.diff(d) >= 0), f"tile {t} not depth sorted"


def test_tiles_matches_oracle(rng):
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=96)
    bg = jnp.array([0.15, 0.25, 0.35])
    out_o = rasterize(splats, cam.device_params(), bg, mode="oracle")
    out_t = rasterize(
        splats, cam.device_params(), bg, mode="tiles", instance_cap=8192, k_max=128
    )
    np.testing.assert_allclose(
        np.asarray(out_t.image), np.asarray(out_o.image), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_t.alpha), np.asarray(out_o.alpha), atol=2e-5
    )


def test_tiles_matches_oracle_nondivisible(rng):
    """Image dims not divisible by the tile size exercise the crop path."""
    cam = make_camera(50, 35)
    splats = make_random_splats(rng, n=48)
    bg = jnp.zeros(3)
    out_o = rasterize(splats, cam.device_params(), bg, mode="oracle")
    out_t = rasterize(splats, cam.device_params(), bg, mode="tiles", instance_cap=8192, k_max=128)
    np.testing.assert_allclose(np.asarray(out_t.image), np.asarray(out_o.image), atol=2e-5)


def test_gradient_matches_oracle(rng):
    cam = make_camera(32, 32)
    splats = make_random_splats(rng, n=24)
    bg = jnp.zeros(3)
    target = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))

    def loss(means, mode):
        s = splats.replace_trainable({**splats.trainable_dict(), "means": means})
        out = rasterize(s, cam.device_params(), bg, mode=mode, instance_cap=4096, k_max=64)
        return jnp.mean((out.image - target) ** 2)

    g_o = jax.grad(lambda m: loss(m, "oracle"))(splats.means)
    g_t = jax.grad(lambda m: loss(m, "tiles"))(splats.means)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_o), rtol=1e-3, atol=1e-6)


def test_overflow_reported(rng):
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=96)
    proj = _proj(splats, cam)
    true_total = int(np.asarray(proj.n_touched).sum())
    asg = build_tile_assignment(proj, grid_w=4, grid_h=3, instance_cap=16)
    assert int(asg.n_instances) == true_total  # true total still reported
    assert int(np.asarray(asg.instance_valid).sum()) <= 16


def test_pallas_layout_matches_compact(rng):
    """The chunk-aligned layout holds exactly the compact layout's instances,
    per tile, in the same order."""
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=64)
    proj = _proj(splats, cam)
    a1 = build_tile_assignment(proj, grid_w=4, grid_h=3, instance_cap=4096)
    a2 = build_tile_assignment(
        proj, grid_w=4, grid_h=3, instance_cap=4096, chunk_align=128
    )
    g1, g2 = np.asarray(a1.gaussian_idx), np.asarray(a2.gaussian_idx)
    s1, s2 = np.asarray(a1.tile_start), np.asarray(a2.tile_start)
    c = np.asarray(a1.tile_count)
    np.testing.assert_array_equal(c, np.asarray(a2.tile_count))
    for t in range(12):
        np.testing.assert_array_equal(
            g1[s1[t] : s1[t] + c[t]], g2[s2[t] : s2[t] + c[t]]
        )


def test_inference_binning_matches_training(rng):
    """need_grad=False (fused single-key sort, no inverse permutation) must
    produce the same per-tile sets and depth order (up to quantized-depth
    ties) and the same rendered image as the training layout."""
    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=128)
    proj = _proj(splats, cam)
    for chunk in (1, 64):
        a_tr = build_tile_assignment(
            proj, grid_w=4, grid_h=3, instance_cap=4096, chunk_align=chunk
        )
        a_inf = build_tile_assignment(
            proj, grid_w=4, grid_h=3, instance_cap=4096, chunk_align=chunk,
            need_grad=False,
        )
        assert int(a_inf.n_instances) == int(a_tr.n_instances)
        np.testing.assert_array_equal(
            np.asarray(a_inf.tile_start), np.asarray(a_tr.tile_start))
        np.testing.assert_array_equal(
            np.asarray(a_inf.tile_count), np.asarray(a_tr.tile_count))
        g_tr, g_inf = np.asarray(a_tr.gaussian_idx), np.asarray(a_inf.gaussian_idx)
        depth = np.asarray(proj.depth)
        starts, counts = np.asarray(a_tr.tile_start), np.asarray(a_tr.tile_count)
        for t in range(12):
            sl = slice(starts[t], starts[t] + counts[t])
            assert set(g_tr[sl]) == set(g_inf[sl]), f"tile {t} sets differ"
            d = depth[g_inf[sl]]
            assert np.all(np.diff(d) >= -1e-5), f"tile {t} not depth sorted"

    img_tr = rasterize(
        splats, cam.device_params(), jnp.zeros(3), mode="tiles",
        instance_cap=4096).image
    img_inf = rasterize(
        splats, cam.device_params(), jnp.zeros(3), mode="tiles",
        instance_cap=4096, inference=True).image
    np.testing.assert_allclose(
        np.asarray(img_inf), np.asarray(img_tr), atol=2e-3)


def test_count_instances_probe_matches_rasterize(rng):
    """The headless renderer's projection-only cap probe must agree with the
    full pipeline's true instance count (rasterize.n_instances)."""
    import jax

    from lichtfeld_studio_tpu.ops.rasterize import count_instances, rasterize
    from tests.scene_utils import make_camera, make_random_splats

    cam = make_camera(64, 48)
    splats = make_random_splats(rng, n=80, capacity=128)
    out = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="tiles",
                    tile_size=16, instance_cap=4096, k_max=256)
    probe = jax.jit(count_instances, static_argnames=("tile_size",))(
        splats, cam.device_params(), tile_size=16)
    assert int(probe) == int(out.n_instances)
