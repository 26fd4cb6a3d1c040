"""Native library tests: C++ parsers/kernels vs pure-Python fallbacks."""

import struct

import numpy as np
import pytest

from lichtfeld_studio_tpu.io import native


def _synthetic_points3d_bin(rng, n=500) -> tuple[bytes, np.ndarray, np.ndarray]:
    means = rng.normal(0, 2, (n, 3)).astype(np.float64)
    colors = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    out = bytearray(struct.pack("<Q", n))
    for i in range(n):
        track_len = int(rng.integers(0, 5))
        out += struct.pack("<Q", i)
        out += struct.pack("<3d", *means[i])
        out += struct.pack("<3B", *colors[i])
        out += struct.pack("<d", 0.5)
        out += struct.pack("<Q", track_len)
        out += b"\x00" * (8 * track_len)
    return bytes(out), means.astype(np.float32), colors.astype(np.float32)


def test_native_builds():
    assert native.available(), "native library failed to build"


def test_points3d_parse(rng):
    data, means, colors = _synthetic_points3d_bin(rng)
    parsed = native.parse_points3d_bin(data)
    assert parsed is not None
    np.testing.assert_allclose(parsed[0], means, atol=1e-6)
    np.testing.assert_allclose(parsed[1], colors, atol=0)


def test_points3d_matches_python_reader(rng, tmp_path):
    from lichtfeld_studio_tpu.io.colmap import _read_points3d_bin

    data, means, colors = _synthetic_points3d_bin(rng, n=100)
    p = tmp_path / "points3D.bin"
    p.write_bytes(data)
    pc = _read_points3d_bin(p)
    np.testing.assert_allclose(pc.means, means, atol=1e-6)
    np.testing.assert_allclose(pc.colors, colors, atol=0)


def test_deinterleave(rng):
    n, stride = 1000, 7
    blob = rng.normal(0, 1, (n, stride)).astype(np.float32)
    sel = np.array([0, 3, 6], np.int32)
    out = native.deinterleave(blob.reshape(-1), n, stride, sel)
    assert out is not None
    np.testing.assert_allclose(out, blob[:, sel].T, atol=0)


def test_resize_box(rng):
    img = rng.uniform(0, 1, (64, 48, 3)).astype(np.float32)
    out = native.resize_box(img, 4)
    assert out is not None
    expect = img.reshape(16, 4, 12, 4, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expect, atol=1e-6)
