"""SplatData crop/transform tests (parity: reference crop_by_cropbox +
transform; used by the crop-box tool and scene alignment)."""

import numpy as np

from lichtfeld_studio_tpu.core.geometry import BoundingBox, EuclideanTransform
from tests.scene_utils import make_random_splats


def test_crop_by_bbox(rng):
    splats = make_random_splats(rng, n=64, spread=1.5)
    bbox = BoundingBox(np.full(3, -0.5, np.float32), np.full(3, 0.5, np.float32))
    cropped = splats.crop_by_bbox(bbox)
    n = int(cropped.n_active)
    assert 0 < n < 64
    means = np.asarray(cropped.means[:n])
    assert bbox.contains(means).all()


def test_transform_rotation(rng):
    splats = make_random_splats(rng, n=16)
    tf = EuclideanTransform.from_euler(0, 0, np.pi / 2, [1.0, 0.0, 0.0])
    out = splats.transformed(tf)
    m0 = np.asarray(splats.means[:16])
    m1 = np.asarray(out.means[:16])
    np.testing.assert_allclose(m1, tf.apply(m0), atol=1e-5)
    # quats stay unit and rotations compose: R_new = R_t @ R_old
    from lichtfeld_studio_tpu.ops.gaussians import quat_to_rotmat
    import jax.numpy as jnp

    r_old = np.asarray(quat_to_rotmat(splats.get_rotation()[:16]))
    r_new = np.asarray(quat_to_rotmat(jnp.asarray(np.asarray(out.rotation[:16]))))
    for i in range(16):
        np.testing.assert_allclose(r_new[i], tf.rotation @ r_old[i], atol=1e-5)
