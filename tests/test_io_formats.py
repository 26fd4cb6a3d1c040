"""IO format roundtrip tests (parity bar: reference PLY/SOG read+write,
COLMAP parsers, dataset split rule)."""

import numpy as np
import pytest

from lichtfeld_studio_tpu.core.point_cloud import PointCloud
from lichtfeld_studio_tpu.io.dataset import CameraDataset
from lichtfeld_studio_tpu.io.ply import is_splat_ply, read_ply, write_ply
from lichtfeld_studio_tpu.io.sog import morton_encode, read_sog, write_sog, _pack_quats, _unpack_quats
from tests.scene_utils import make_camera, make_random_splats


def _make_pc(rng, n=64) -> PointCloud:
    splats = make_random_splats(rng, n=n)
    return splats.to_point_cloud()


def test_ply_roundtrip(rng, tmp_path):
    pc = _make_pc(rng)
    path = tmp_path / "splat.ply"
    write_ply(pc, path)
    assert is_splat_ply(path)
    pc2 = read_ply(path)
    np.testing.assert_allclose(pc2.means, pc.means, atol=1e-6)
    np.testing.assert_allclose(pc2.sh0, pc.sh0, atol=1e-6)
    np.testing.assert_allclose(pc2.shN, pc.shN, atol=1e-6)
    np.testing.assert_allclose(pc2.opacity, pc.opacity, atol=1e-6)
    np.testing.assert_allclose(pc2.scaling, pc.scaling, atol=1e-6)
    np.testing.assert_allclose(pc2.rotation, pc.rotation, atol=1e-6)


def test_ply_attribute_order(rng, tmp_path):
    """On-disk attribute schema must match the reference exporter exactly
    (splat_data.cpp:402-418)."""
    pc = _make_pc(rng, n=4)
    path = tmp_path / "s.ply"
    write_ply(pc, path)
    header = path.read_bytes()[:4096].decode("ascii", errors="ignore")
    names = [l.split()[-1] for l in header.splitlines() if l.startswith("property")]
    assert names[:6] == ["x", "y", "z", "nx", "ny", "nz"]
    assert names[6:9] == ["f_dc_0", "f_dc_1", "f_dc_2"]
    assert names[9] == "f_rest_0" and names[53] == "f_rest_44"
    assert names[54] == "opacity"
    assert names[55:58] == ["scale_0", "scale_1", "scale_2"]
    assert names[58:62] == ["rot_0", "rot_1", "rot_2", "rot_3"]


def test_quat_pack_roundtrip(rng):
    q = rng.normal(0, 1, (128, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    packed = _pack_quats(q)
    q2 = _unpack_quats(packed)
    # sign-canonicalized comparison (q and -q are the same rotation)
    dots = np.abs(np.sum(q * q2, axis=1))
    assert np.all(dots > 0.9995), dots.min()


def test_morton_locality(rng):
    pts = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    codes = morton_encode(pts)
    order = np.argsort(codes)
    d = np.linalg.norm(np.diff(pts[order], axis=0), axis=1)
    d_rand = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert d.mean() < d_rand.mean()  # sorted order is spatially coherent


@pytest.mark.slow
def test_sog_roundtrip(rng, tmp_path):
    pc = _make_pc(rng, n=200)
    path = tmp_path / "splat.sog"
    write_sog(pc, path, kmeans_iterations=8)
    pc2 = read_sog(path)
    assert pc2.size == pc.size
    # SOG is lossy; compare distributions / coarse values (sorted by x)
    o1 = np.argsort(pc.means[:, 0] + 1e-3 * pc.means[:, 1])
    o2 = np.argsort(pc2.means[:, 0] + 1e-3 * pc2.means[:, 1])
    np.testing.assert_allclose(pc2.means[o2], pc.means[o1], atol=5e-3)
    np.testing.assert_allclose(
        np.sort(pc2.scaling.reshape(-1)), np.sort(pc.scaling.reshape(-1)), atol=0.1
    )
    # opacity coarse roundtrip (8-bit)
    s1 = 1 / (1 + np.exp(-np.sort(pc.opacity.reshape(-1))))
    s2 = 1 / (1 + np.exp(-np.sort(pc2.opacity.reshape(-1))))
    np.testing.assert_allclose(s2, s1, atol=0.01)


def test_dataset_split_rule(rng):
    cams = [make_camera(8, 8) for _ in range(20)]
    train = CameraDataset(cams, "train", test_every=8)
    val = CameraDataset(cams, "val", test_every=8)
    assert val.indices() == [0, 8, 16]  # i % 8 == 0 (dataset.hpp:42-48)
    assert len(train) == 17
    assert set(train.indices()) | set(val.indices()) == set(range(20))
    everything = CameraDataset(cams, "train", test_every=0)
    assert len(everything) == 20
