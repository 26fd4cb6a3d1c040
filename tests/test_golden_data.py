"""Golden-statistics integration tests over REAL trained gaussians.

The reference's equivalent loads MipNeRF360-garden tensors and allcloses
projection / SH / binning / full rasterization between the CUDA kernels and
the torch oracle (tests/test_garden_data.cpp:56-677). Here the fixture is a
frozen trained checkpoint (tools/make_golden.py; tests/data/
golden_splats.npz) and the comparison runs pallas-interpret vs tiles vs the
dense oracle on realistic statistics — heavy-tailed footprints, anisotropy,
deep tiles — that the small synthetic suites cannot produce.

Provenance caveat: the fixture is SELF-TRAINED by this repo's own trainer
(no datasets/egress in this environment), so a systematic bias shared by
the trainer and the fixture would be invisible here; the reference's
externally-trained garden tensors remain the stronger gate and should
replace this fixture the moment a real scene is available."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.core.camera import look_at_camera
from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.ops.projection import project_gaussians
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.ops.tiles import build_tile_assignment

FIXTURE = Path(__file__).parent / "data" / "golden_splats.npz"

pytestmark = pytest.mark.skipif(
    not FIXTURE.exists(),
    reason="golden fixture missing — generate with tools/make_golden.py",
)

W, H = 648, 420  # full stats/binning geometry
WR, HR = 320, 208  # render-parity geometry (interpret-mode pallas is slow on CPU)
TS = 16
GW, GH = -(-W // TS), -(-H // TS)
ICAP = 2 * 2**20


@pytest.fixture(scope="module")
def golden():
    d = np.load(FIXTURE)
    n = d["means"].shape[0]
    splats = SplatData.from_arrays(
        d["means"].astype(np.float32),
        d["sh0"].astype(np.float32),
        d["shN"].astype(np.float32),
        d["scaling"].astype(np.float32),
        d["rotation"].astype(np.float32),
        d["opacity"].astype(np.float32),
        capacity=n,
    )
    import dataclasses
    import jax.numpy as jnp

    splats = dataclasses.replace(splats, active_sh_degree=jnp.asarray(3, jnp.int32))
    cam = look_at_camera(
        np.array([0.0, -0.4, -4.2]), np.zeros(3), np.array([0.0, -1.0, 0.0]),
        fx=570.0, fy=570.0, width=W, height=H,
    ).device_params()
    return splats, cam


def _project(splats, cam):
    return project_gaussians(
        splats.means, splats.scaling, splats.rotation, splats.opacity,
        splats.sh0, splats.shN, splats.active_mask(), splats.active_sh_degree,
        cam.w2c, cam.cam_position, cam.K, width=W, height=H, tile_size=TS,
    )


def test_golden_statistics_are_realistic(golden):
    """The fixture must actually exercise trained-model statistics."""
    splats, cam = golden
    n = int(splats.n_active)
    assert n >= 20_000, n
    proj = _project(splats, cam)
    v = np.asarray(proj.valid)
    assert v.sum() > 0.3 * n
    nt = np.asarray(proj.n_touched)[v]
    # heavy tail: some gaussians cover many tiles; the median stays moderate
    assert nt.max() >= 16, nt.max()
    assert 1 <= np.median(nt) <= 32, np.median(nt)
    op = np.asarray(proj.opacity)[v]
    assert (op > 0.5).mean() > 0.05 and (op < 0.1).mean() > 0.05

    assign = build_tile_assignment(
        proj, grid_w=GW, grid_h=GH, instance_cap=ICAP,
    )
    counts = np.asarray(assign.tile_count)
    assert int(assign.n_instances) > 1.5 * v.sum()  # multi-tile on average
    assert counts.max() > 256, "no deep tiles — fixture too sparse"


def test_golden_binning_invariants(golden):
    """Structural invariants of the layout on real statistics: per-tile
    ranges are depth-sorted, disjoint, and owner ids match the expansion."""
    splats, cam = golden
    proj = _project(splats, cam)
    from lichtfeld_studio_tpu.kernels.blend_pallas import CHUNK

    assign = build_tile_assignment(
        proj, grid_w=GW, grid_h=GH, instance_cap=ICAP, chunk_align=CHUNK,
    )
    start = np.asarray(assign.tile_start)
    count = np.asarray(assign.tile_count)
    gidx = np.asarray(assign.gaussian_idx)
    valid = np.asarray(assign.instance_valid)
    depth = np.asarray(proj.depth)
    assert (start % CHUNK == 0).all()
    # spot-check the 32 deepest tiles
    deep = np.argsort(-count)[:32]
    for t in deep:
        s, c = start[t], count[t]
        seg_valid = valid[s : s + c]
        assert seg_valid.all(), f"invalid slot inside tile {t} range"
        d = depth[gidx[s : s + c]]
        assert (np.diff(d) >= -1e-6).all(), f"tile {t} not depth sorted"
        # slack slots after the range must be invalid until the chunk edge
        pad_end = -(-c // CHUNK) * CHUNK
        assert not valid[s + c : s + pad_end].any()


def _render_cam(golden):
    splats, _ = golden
    cam = look_at_camera(
        np.array([0.0, -0.4, -5.5]), np.zeros(3), np.array([0.0, -1.0, 0.0]),
        fx=260.0, fy=260.0, width=WR, height=HR,
    ).device_params()
    return splats, cam


def test_golden_full_render_tiles_vs_pallas(golden):
    """Full-frame image parity between the dense tiles blend and the Pallas
    streaming kernel (interpret mode on CPU) at deep-tile statistics —
    the test_garden_data.cpp rasterization allclose analog."""
    splats, cam = _render_cam(golden)
    bg = jnp.zeros(3)
    a = rasterize(splats, cam, bg, mode="tiles", instance_cap=ICAP, k_max=2048)
    b = rasterize(splats, cam, bg, mode="pallas", instance_cap=ICAP)
    img_a = np.asarray(a.image)
    img_b = np.asarray(b.image)
    # bf16-packed colors in the pallas stream: ~4e-3 relative
    err = np.abs(img_a - img_b)
    assert np.median(err) < 2e-3, np.median(err)
    assert (err < 0.05).mean() > 0.995, err.max()
    al = np.abs(np.asarray(a.alpha) - np.asarray(b.alpha))
    assert np.median(al) < 2e-3


def test_golden_gradients_match_tiles_vs_pallas(golden):
    """Backward parity on real statistics: per-gaussian gradients of a
    photometric loss agree between tiles (XLA autodiff over the dense
    blend) and pallas (replay kernel + slot-sort reduction)."""
    import jax

    splats, cam = _render_cam(golden)
    bg = jnp.zeros(3)
    gt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (HR, WR, 3)).astype(np.float32)
    )

    def loss(params, mode):
        s = splats.replace_trainable(params)
        out = rasterize(s, cam, bg, mode=mode, instance_cap=ICAP, k_max=2048)
        return jnp.mean(jnp.abs(out.image - gt))

    p = splats.trainable_dict()
    g_t = jax.grad(lambda q: loss(q, "tiles"))(p)
    g_p = jax.grad(lambda q: loss(q, "pallas"))(p)
    for k in ("means", "opacity", "sh0"):
        a = np.asarray(g_t[k]).ravel()
        b = np.asarray(g_p[k]).ravel()
        denom = np.abs(a).max() + 1e-12
        # bf16 gradient quantization: compare at 1% of max-grad scale
        close = np.abs(a - b) <= 0.01 * denom + 1e-9
        assert close.mean() > 0.99, (k, close.mean())


def test_golden_gradients_vs_oracle(golden):
    """VJP parity gate grounded in the DENSE ORACLE on the golden fixture
    (VERDICT r3): cotangents of a photometric loss through the oracle
    (per-pixel blend over all gaussians, no binning at all) must agree with
    both pipeline backends at real trained statistics. Small window — the
    oracle is O(N * pixels)."""
    import jax

    splats, _ = golden
    cam = look_at_camera(
        np.array([0.0, -0.4, -5.5]), np.zeros(3), np.array([0.0, -1.0, 0.0]),
        fx=110.0, fy=110.0, width=64, height=48,
    ).device_params()
    bg = jnp.zeros(3)
    gt = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (48, 64, 3)).astype(np.float32)
    )

    def loss(params, mode):
        s = splats.replace_trainable(params)
        out = rasterize(s, cam, bg, mode=mode, instance_cap=ICAP, k_max=4096)
        return jnp.mean(jnp.abs(out.image - gt))

    p = splats.trainable_dict()
    g_o = jax.grad(lambda q: loss(q, "oracle"))(p)
    for mode in ("tiles", "pallas"):
        g_m = jax.grad(lambda q: loss(q, mode))(p)
        for k in ("means", "opacity", "sh0", "scaling"):
            a = np.asarray(g_o[k]).ravel()
            b = np.asarray(g_m[k]).ravel()
            denom = np.abs(a).max() + 1e-12
            close = np.abs(a - b) <= 0.01 * denom + 1e-9
            assert close.mean() > 0.99, (mode, k, close.mean())
