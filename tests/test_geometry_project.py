"""Geometry + project management tests (parity bars: reference
tests/test_geometry.cpp SE(3) roundtrips and tests/test_management.cpp
.lfs write/read/migrate roundtrips)."""

import json

import numpy as np

from lichtfeld_studio_tpu.core.geometry import BoundingBox, EuclideanTransform
from lichtfeld_studio_tpu.core.project import CURRENT_VERSION, Project


def test_se3_roundtrip(rng):
    for _ in range(8):
        q = rng.normal(0, 1, 4)
        q /= np.linalg.norm(q)
        t = rng.normal(0, 2, 3)
        tf = EuclideanTransform(q, t)
        m = tf.to_matrix()
        tf2 = EuclideanTransform.from_matrix(m)
        np.testing.assert_allclose(tf2.to_matrix(), m, atol=1e-10)
        # inverse composes to identity
        ident = tf.compose(tf.inverse()).to_matrix()
        np.testing.assert_allclose(ident, np.eye(4), atol=1e-10)


def test_se3_apply(rng):
    tf = EuclideanTransform.from_euler(0.0, 0.0, np.pi / 2, [1.0, 0.0, 0.0])
    p = np.array([[1.0, 0.0, 0.0]])
    out = tf.apply(p)
    np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-12)


def test_bbox(rng):
    pts = rng.uniform(-2, 2, (64, 3))
    bb = BoundingBox.from_points(pts)
    assert bb.contains(pts).all()
    inner = BoundingBox(np.array([-1.0, -1.0, -1.0]), np.array([1.0, 1.0, 1.0]))
    frac = inner.contains(pts).mean()
    assert 0 < frac < 1


def test_project_roundtrip(tmp_path):
    p = Project.create(tmp_path / "proj", "myproj", "data", "out", {"iterations": 100})
    p.add_ply("splat_100", "out/splat_100.ply", 100)
    p2 = Project.load(p.path)
    assert p2.data["project_name"] == "myproj"
    assert p2.data["version"] == CURRENT_VERSION
    assert p2.plys()[0].iteration == 100


def test_project_v1_migration(tmp_path):
    old = {
        "version": 1,
        "project_name": "legacy",
        "outputs": ["a.ply", "b.ply"],
    }
    path = tmp_path / "legacy.lfs"
    path.write_text(json.dumps(old))
    p = Project.load(path)
    assert p.data["version"] == CURRENT_VERSION
    assert [r.name for r in p.plys()] == ["a", "b"]


def test_temp_project_cleanup(tmp_path):
    p = Project.create_temp()
    assert p.path.exists()
    lock = p.path.parent / ".lock"
    lock.write_text("999999999")  # dead pid
    removed = Project.remove_temp_unlocked(p.path.parent.parent)
    assert removed >= 1
    assert not p.path.exists()
