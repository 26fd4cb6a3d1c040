"""WebGL viewer export: binary layout, quantization round-trip, and the
render-mode feature surface (reference src/rendering RenderMode parity)."""

import base64
import json
import re

import numpy as np

from lichtfeld_studio_tpu.render.web_viewer import export_html
from tests.scene_utils import make_random_splats


def _extract(html: str):
    meta = json.loads(re.search(r"const META = (\{.*?\});", html).group(1))
    data = base64.b64decode(re.search(r'atob\("([A-Za-z0-9+/=]*)"\)', html).group(1))
    return meta, data


def test_export_layout_and_quantization(rng, tmp_path):
    splats = make_random_splats(rng, n=100, capacity=128)
    out = export_html(splats, tmp_path / "v.html")
    html = out.read_text()
    meta, data = _extract(html)

    stride = 12 + 4 + 12 + 9
    assert meta["count"] == 100
    assert len(data) == 100 * stride

    buf = np.frombuffer(data, np.uint8).reshape(100, stride)
    pos = buf[:, 0:12].copy().view("<f4")
    np.testing.assert_allclose(pos, np.asarray(splats.means[:100]), rtol=1e-6)
    # opacity byte = sigmoid(logit) * 255
    opac = buf[:, 15].astype(np.float64)
    want = 255.0 / (1.0 + np.exp(-np.asarray(splats.opacity[:100, 0])))
    assert np.abs(opac - want).max() <= 1.0
    # SH1 int8 quantization round-trips within one step
    sh1 = buf[:, 28:37].copy().view(np.int8).astype(np.float32) * meta["sh1_scale"]
    want_sh1 = np.asarray(splats.shN[:100, :3, :]).reshape(100, 9)
    assert np.abs(sh1 - want_sh1).max() <= meta["sh1_scale"] * 1.01


def test_export_feature_surface(rng, tmp_path):
    splats = make_random_splats(rng, n=50, capacity=64)
    html = export_html(splats, tmp_path / "v.html").read_text()
    # render modes (keys 1-4), SH1 view dependence, counting sort, controls
    for needle in [
        "uniform int mode",
        "turbo(",  # depth colormap
        "point cloud",
        "splitx",
        "a_sh1a",
        "drawArraysInstanced",
        "vertexAttribDivisor",
    ]:
        assert needle in html, needle
    # template substitutions fully resolved
    assert "__META__" not in html and "__DATA__" not in html


def test_export_overlay_tools(rng, tmp_path):
    """Crop box / axes / grid / frustum overlays (reference
    rendering_manager.hpp:49-75 + crop_box_panel.hpp:15-16)."""
    from lichtfeld_studio_tpu.core.camera import look_at_camera

    splats = make_random_splats(rng, n=80, capacity=128)
    cams = [
        look_at_camera(
            np.array([2.0, 0.5, float(k)]), np.zeros(3), np.array([0.0, -1.0, 0.0]),
            fx=60.0, fy=60.0, width=64, height=48,
        )
        for k in range(3)
    ]
    html = export_html(splats, tmp_path / "v.html", cameras=cams).read_text()
    meta, _ = _extract(html)
    # crop box bounds embedded and ordered
    assert np.all(np.asarray(meta["bbox_min"]) <= np.asarray(meta["bbox_max"]))
    # one frustum record (eye + 4 corners = 15 floats) per camera
    assert len(meta["frustums"]) == 3
    assert all(len(f) == 15 for f in meta["frustums"])
    eye = np.asarray(meta["frustums"][1][:3])
    np.testing.assert_allclose(eye, [2.0, 0.5, 1.0], atol=1e-5)
    for needle in ["useCrop", "cropMin", "cropMax", "axesLines", "gridLines",
                   "boxLines", "frustumGeo", "drawLines"]:
        assert needle in html, needle
    # no cameras -> overlay still compiles with an empty frustum list
    html2 = export_html(splats, tmp_path / "v2.html").read_text()
    meta2, _ = _extract(html2)
    assert meta2["frustums"] == []


def test_export_respects_max_points(rng, tmp_path):
    splats = make_random_splats(rng, n=200, capacity=256)
    html = export_html(splats, tmp_path / "v.html", max_points=64).read_text()
    meta, data = _extract(html)
    assert meta["count"] == 64
    assert len(data) == 64 * (12 + 4 + 12 + 9)


def test_export_multi_model_scene(rng, tmp_path):
    """Multi-model export (SceneManager parity): per-model ranges in META,
    visibility panel wiring, concatenated buffer."""
    a = make_random_splats(rng, n=60, capacity=64)
    b = make_random_splats(rng, n=40, capacity=64)
    out = export_html([("left", a), ("right", b)], tmp_path / "scene.html")
    html = out.read_text()
    meta, data = _extract(html)
    assert [m["name"] for m in meta["models"]] == ["left", "right"]
    assert [m["count"] for m in meta["models"]] == [60, 40]
    assert meta["models"][1]["start"] == 60
    assert meta["count"] == 100
    stride = 12 + 4 + 12 + 9
    assert len(data) == 100 * stride
    buf = np.frombuffer(data, np.uint8).reshape(100, stride)
    pos = buf[:, 0:12].copy().view("<f4")
    np.testing.assert_allclose(pos[:60], np.asarray(a.means[:60]), rtol=1e-6)
    np.testing.assert_allclose(pos[60:], np.asarray(b.means[:40]), rtol=1e-6)
    # visibility machinery present
    for needle in ["modelOf", "drawCount", 'getElementById("scene")']:
        assert needle in html, needle


def test_cli_multi_model_view(rng, tmp_path):
    """-v a.ply,b.ply exports a two-model viewer via the real CLI path."""
    from lichtfeld_studio_tpu.cli import main
    from lichtfeld_studio_tpu.io.ply import write_ply

    a = make_random_splats(rng, n=30, capacity=32)
    b = make_random_splats(rng, n=20, capacity=32)
    pa, pb = tmp_path / "a.ply", tmp_path / "b.ply"
    write_ply(a.to_point_cloud(), str(pa))
    write_ply(b.to_point_cloud(), str(pb))
    out = tmp_path / "scene.html"
    rc = main(["-v", f"{pa},{pb}", "--render-output", str(out)])
    assert rc == 0
    meta, _ = _extract(out.read_text())
    assert [m["name"] for m in meta["models"]] == ["a", "b"]
    assert meta["count"] == 50


def test_cli_multi_model_composite_render(rng, tmp_path):
    """-v a.ply,b.ply --render-output x.png composites both models."""
    from lichtfeld_studio_tpu.cli import main
    from lichtfeld_studio_tpu.io.ply import write_ply

    a = make_random_splats(rng, n=16, capacity=16)
    b = make_random_splats(rng, n=12, capacity=16)
    pa, pb = tmp_path / "a.ply", tmp_path / "b.ply"
    write_ply(a.to_point_cloud(), str(pa))
    write_ply(b.to_point_cloud(), str(pb))
    out = tmp_path / "composite.png"
    rc = main(["-v", f"{pa},{pb}", "--render-output", str(out),
               "--render-size", "64", "48"])
    assert rc == 0 and out.exists()
    from lichtfeld_studio_tpu.io.image import load_image
    img = load_image(str(out))
    assert img.shape[:2] == (48, 64)
