"""The Gaussian splat model as a JAX pytree.

Reference: SplatData (include/core/splat_data.hpp:23-121,
src/core/splat_data.cpp:508-608). TPU-native redesign decisions:

* **Static capacity.** The reference mutates tensor sizes during
  densification and performs optimizer-state surgery on every resize
  (mcmc.cpp:269-336). Under XLA every shape change is a recompile, so here
  all arrays are allocated at a fixed ``capacity`` and a traced ``n_active``
  scalar plus per-slot validity (slot index < n_active) replace dynamic N.
  Growth is a scatter into dead slots; pruning is a mask — both are
  functional `tree_map`s with no pointer juggling.

* **Traced SH degree.** `active_sh_degree` increments every
  `sh_degree_interval` steps (reference mcmc.cpp:371-374). It is a traced
  int32 so the train step stays a single compiled function; the SH kernel
  computes all bases and masks by degree.

Raw parameterizations match the reference exactly: `scaling` is log(sigma),
`opacity` is logit(alpha), `rotation` is an unnormalized wxyz quaternion,
sh0/shN are [N,1,3]/[N,K-1,3] SH coefficients.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.core.point_cloud import PointCloud

SH_C0 = 0.28209479177387814


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["means", "sh0", "shN", "scaling", "rotation", "opacity", "n_active", "active_sh_degree"],
    meta_fields=["max_sh_degree", "scene_scale"],
)
@dataclass
class SplatData:
    means: jax.Array  # [C, 3] float32
    sh0: jax.Array  # [C, 1, 3] float32
    shN: jax.Array  # [C, K-1, 3] float32
    scaling: jax.Array  # [C, 3] float32, log(sigma)
    rotation: jax.Array  # [C, 4] float32, wxyz (unnormalized)
    opacity: jax.Array  # [C, 1] float32, logit(alpha)
    n_active: jax.Array  # [] int32, number of live slots (prefix of capacity)
    active_sh_degree: jax.Array  # [] int32
    max_sh_degree: int = 3
    scene_scale: float = 1.0

    # ------------------------------------------------------------------
    # Shape properties
    # ------------------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def n_sh_bases(self) -> int:
        return 1 + self.shN.shape[1]

    # ------------------------------------------------------------------
    # Activated getters (reference splat_data.hpp:267-286)
    # ------------------------------------------------------------------
    def get_scaling(self) -> jax.Array:
        return jnp.exp(self.scaling)

    def get_opacity(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity)

    def get_rotation(self) -> jax.Array:
        norm = jnp.linalg.norm(self.rotation, axis=-1, keepdims=True)
        return self.rotation / jnp.maximum(norm, 1e-12)

    def active_mask(self) -> jax.Array:
        """[C] bool — True for live slots."""
        idx = jnp.arange(self.capacity, dtype=jnp.int32)
        return idx < self.n_active

    def trainable_dict(self) -> dict[str, jax.Array]:
        """The six optimizable leaves, keyed by parameter-group name
        (order mirrors the reference optimizer groups, mcmc.cpp:487-492)."""
        return {
            "means": self.means,
            "sh0": self.sh0,
            "shN": self.shN,
            "scaling": self.scaling,
            "rotation": self.rotation,
            "opacity": self.opacity,
        }

    def replace_trainable(self, params: dict[str, jax.Array]) -> "SplatData":
        return dataclasses.replace(self, **params)

    def increment_sh_degree(self) -> "SplatData":
        return dataclasses.replace(
            self,
            active_sh_degree=jnp.minimum(self.active_sh_degree + 1, self.max_sh_degree),
        )

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_point_cloud(
        positions: np.ndarray,
        colors_rgb01: np.ndarray,
        scene_center: np.ndarray,
        *,
        capacity: int,
        max_sh_degree: int = 3,
        init_opacity: float = 0.5,
        init_scaling: float = 0.1,
    ) -> "SplatData":
        """Initialize from SfM points (reference splat_data.cpp:508-608).

        * scene_scale = median distance of points to scene_center
        * log-scale init: log(sqrt(mean-3NN-distance) * init_scaling)
        * identity quaternions, logit(init_opacity), DC SH from RGB
        * slots [N, capacity) are zero-filled dead padding
        """
        positions = np.asarray(positions, dtype=np.float32)
        colors_rgb01 = np.asarray(colors_rgb01, dtype=np.float32)
        n = positions.shape[0]
        if n > capacity:
            raise ValueError(f"point count {n} exceeds capacity {capacity}")

        dists = np.linalg.norm(positions - np.asarray(scene_center, np.float32)[None], axis=1)
        scene_scale = float(np.median(dists)) if n else 1.0

        nn_dist = np.clip(_mean_neighbor_distances(positions), 1e-7, None)
        log_scales = np.log(np.sqrt(nn_dist) * init_scaling).astype(np.float32)

        n_bases = (max_sh_degree + 1) ** 2
        c = capacity

        means = np.zeros((c, 3), np.float32)
        means[:n] = positions
        scaling = np.full((c, 3), -10.0, np.float32)  # dead slots: tiny sigma
        scaling[:n] = log_scales[:, None]
        rotation = np.zeros((c, 4), np.float32)
        rotation[:, 0] = 1.0
        opacity = np.full((c, 1), -15.0, np.float32)  # dead slots: alpha ~ 0
        eps = 1e-7
        p = min(max(init_opacity, eps), 1 - eps)
        opacity[:n] = np.log(p / (1 - p))
        sh0 = np.zeros((c, 1, 3), np.float32)
        sh0[:n, 0, :] = (colors_rgb01 - 0.5) / SH_C0
        shN = np.zeros((c, n_bases - 1, 3), np.float32)

        return SplatData(
            means=jnp.asarray(means),
            sh0=jnp.asarray(sh0),
            shN=jnp.asarray(shN),
            scaling=jnp.asarray(scaling),
            rotation=jnp.asarray(rotation),
            opacity=jnp.asarray(opacity),
            n_active=jnp.asarray(n, jnp.int32),
            active_sh_degree=jnp.asarray(0, jnp.int32),
            max_sh_degree=max_sh_degree,
            scene_scale=scene_scale,
        )

    @staticmethod
    def random_init(
        key: jax.Array,
        *,
        num_points: int,
        extent: float,
        capacity: int,
        max_sh_degree: int = 3,
        init_opacity: float = 0.5,
        init_scaling: float = 0.1,
    ) -> "SplatData":
        """Random-init path (reference splat_data.cpp:516-528):
        uniform positions in [-extent, extent]^3 scaled by scene_scale, random colors."""
        kp, kc = jax.random.split(key)
        positions = (jax.random.uniform(kp, (num_points, 3)) * 2.0 - 1.0) * extent
        colors = jax.random.uniform(kc, (num_points, 3))
        positions = np.asarray(positions)
        scene_center = np.zeros(3, np.float32)
        dists = np.linalg.norm(positions - scene_center[None], axis=1)
        # scene_scale from the UNSCALED cloud (splat_data.cpp:528-531), then
        # positions are stretched by it (:542) — the stored model scene_scale
        # stays the unscaled median, not the median of the stretched cloud
        scene_scale = float(np.median(dists))
        sd = SplatData.from_point_cloud(
            positions * scene_scale,
            np.asarray(colors),
            scene_center,
            capacity=capacity,
            max_sh_degree=max_sh_degree,
            init_opacity=init_opacity,
            init_scaling=init_scaling,
        )
        import dataclasses

        return dataclasses.replace(sd, scene_scale=scene_scale)

    @staticmethod
    def from_arrays(
        means: np.ndarray,
        sh0: np.ndarray,
        shN: np.ndarray,
        scaling: np.ndarray,
        rotation: np.ndarray,
        opacity: np.ndarray,
        *,
        capacity: int | None = None,
        max_sh_degree: int | None = None,
        scene_scale: float = 1.0,
    ) -> "SplatData":
        """Build from explicit (host) arrays, e.g. a loaded PLY splat file."""
        n = means.shape[0]
        c = capacity or n
        if max_sh_degree is None:
            max_sh_degree = int(round(np.sqrt(shN.shape[1] + 1))) - 1

        def pad(x, fill=0.0):
            if x.shape[0] == c:
                return jnp.asarray(x, jnp.float32)
            out = np.full((c,) + x.shape[1:], fill, np.float32)
            out[:n] = x
            return jnp.asarray(out)

        rot = np.asarray(rotation, np.float32)
        rot_p = np.zeros((c, 4), np.float32)
        rot_p[:, 0] = 1.0
        rot_p[:n] = rot
        return SplatData(
            means=pad(np.asarray(means, np.float32)),
            sh0=pad(np.asarray(sh0, np.float32)),
            shN=pad(np.asarray(shN, np.float32)),
            scaling=pad(np.asarray(scaling, np.float32), fill=-10.0),
            rotation=jnp.asarray(rot_p),
            opacity=pad(np.asarray(opacity, np.float32), fill=-15.0),
            n_active=jnp.asarray(n, jnp.int32),
            active_sh_degree=jnp.asarray(max_sh_degree, jnp.int32),
            max_sh_degree=max_sh_degree,
            scene_scale=scene_scale,
        )

    # ------------------------------------------------------------------
    # Export helpers (host side)
    # ------------------------------------------------------------------
    def to_point_cloud(self) -> PointCloud:
        """Materialize live slots as a host PointCloud with PLY-compatible
        attribute layout (reference splat_data.cpp:485-506): sh planes are
        transposed to channel-major f_dc_*/f_rest_* order, quats normalized."""
        n = int(self.n_active)
        means = np.asarray(self.means[:n])
        sh0 = np.asarray(self.sh0[:n])  # [n,1,3]
        shN = np.asarray(self.shN[:n])  # [n,K-1,3]
        rot = np.asarray(self.get_rotation()[:n])
        pc = PointCloud(
            means=means,
            normals=np.zeros_like(means),
            sh0=sh0,
            shN=shN,
            opacity=np.asarray(self.opacity[:n]),
            scaling=np.asarray(self.scaling[:n]),
            rotation=rot,
            attribute_names=self.get_attribute_names(),
        )
        return pc

    def crop_by_bbox(self, bbox) -> "SplatData":
        """Keep only gaussians inside the box (reference
        SplatData::crop_by_cropbox, splat_data.cpp:616+). Host-side; returns a
        compacted SplatData with the same capacity."""
        import numpy as np

        n = int(self.n_active)
        means = np.asarray(self.means[:n])
        keep = bbox.contains(means)
        idx = np.nonzero(keep)[0]
        return SplatData.from_arrays(
            means[idx],
            np.asarray(self.sh0[:n])[idx],
            np.asarray(self.shN[:n])[idx],
            np.asarray(self.scaling[:n])[idx],
            np.asarray(self.rotation[:n])[idx],
            np.asarray(self.opacity[:n])[idx],
            capacity=self.capacity,
            max_sh_degree=self.max_sh_degree,
            scene_scale=self.scene_scale,
        )

    def transformed(self, transform) -> "SplatData":
        """Apply an SE(3) EuclideanTransform to the model (reference
        SplatData::transform): rotates means and composes quaternions."""
        import numpy as np

        from lichtfeld_studio_tpu.core.geometry import _rotmat_to_quat_np

        n = int(self.n_active)
        r = transform.rotation.astype(np.float32)
        t = transform.translation.astype(np.float32)
        means = np.asarray(self.means[:n]) @ r.T + t
        # q_new = q_transform * q_old (hamilton product, wxyz)
        q_t = transform.quat / np.linalg.norm(transform.quat)
        q = np.asarray(self.rotation[:n])
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        w1, x1, y1, z1 = q_t
        w2, x2, y2, z2 = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
        q_new = np.stack(
            [
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ],
            axis=1,
        ).astype(np.float32)
        return SplatData.from_arrays(
            means,
            np.asarray(self.sh0[:n]),
            np.asarray(self.shN[:n]),
            np.asarray(self.scaling[:n]),
            q_new,
            np.asarray(self.opacity[:n]),
            capacity=self.capacity,
            max_sh_degree=self.max_sh_degree,
            scene_scale=self.scene_scale,
        )

    def get_attribute_names(self) -> list[str]:
        """PLY attribute order (reference splat_data.cpp:402-418)."""
        names = ["x", "y", "z", "nx", "ny", "nz"]
        names += [f"f_dc_{i}" for i in range(self.sh0.shape[1] * 3)]
        names += [f"f_rest_{i}" for i in range(self.shN.shape[1] * 3)]
        names += ["opacity"]
        names += [f"scale_{i}" for i in range(self.scaling.shape[1])]
        names += [f"rot_{i}" for i in range(self.rotation.shape[1])]
        return names


def _mean_neighbor_distances(points: np.ndarray) -> np.ndarray:
    """Mean distance to the 3 nearest neighbors (d^2 > 1e-8) per point;
    0.01 when no valid neighbor (reference splat_data.cpp:62-111)."""
    n = points.shape[0]
    if n <= 1:
        return np.full((n,), 0.01, np.float32)
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    k = min(4, n)
    dists, _ = tree.query(points, k=k)  # includes self at distance ~0
    d2 = dists**2
    valid = d2 > 1e-8
    # take up to the first 3 valid neighbors per row
    order_rank = np.cumsum(valid, axis=1)
    take = valid & (order_rank <= 3)
    counts = take.sum(axis=1)
    sums = (dists * take).sum(axis=1)
    out = np.where(counts > 0, sums / np.maximum(counts, 1), 0.01)
    return out.astype(np.float32)
