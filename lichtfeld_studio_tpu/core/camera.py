"""Camera model (reference: include/core/camera.hpp:16-120).

Host-side dataclass holding extrinsics/intrinsics plus lazy image loading,
and a device-side pytree view (`CameraParams`) consumed by the jitted render
and train steps. Convention matches COLMAP/the reference: `R, T` define
world-to-camera, x_cam = R @ x_world + T; `w2c` is the 4x4 row-major
world_view_transform; camera center = -R^T @ T.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class CameraModelType:
    """Camera model enum (reference gsplat/Common.h:46-50)."""

    PINHOLE = 0
    OPENCV_PINHOLE = 1
    OPENCV_FISHEYE = 2
    ORTHO = 3


class ShutterType:
    """Shutter enum (reference gsplat/Cameras.h:16-22). Rolling shutters
    interpolate between a start-of-frame and end-of-frame pose per pixel
    row/column."""

    ROLLING_TOP_TO_BOTTOM = 0
    ROLLING_LEFT_TO_RIGHT = 1
    ROLLING_BOTTOM_TO_TOP = 2
    ROLLING_RIGHT_TO_LEFT = 3
    GLOBAL = 4


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["w2c", "cam_position", "K", "uid", "radial", "tangential", "w2c_end"],
    meta_fields=["width", "height", "camera_model", "shutter_type"],
)
@dataclass
class CameraParams:
    """Device-side camera parameters for one view (jit-friendly)."""

    w2c: jax.Array  # [4, 4] world-to-camera
    cam_position: jax.Array  # [3]
    K: jax.Array  # [4] = (fx, fy, cx, cy)
    uid: jax.Array  # [] int32 (for pose-opt / bilateral grid indexing)
    width: int
    height: int
    camera_model: int = CameraModelType.PINHOLE
    radial: jax.Array | None = None  # distortion coeffs (static shape per cam)
    tangential: jax.Array | None = None
    # rolling shutter: end-of-frame pose + scanline direction
    # (reference viewmats0/viewmats1, gsplat/Cameras.h:16-22)
    w2c_end: jax.Array | None = None  # [4, 4]
    shutter_type: int = ShutterType.GLOBAL


@dataclass
class Camera:
    """Host-side camera with lazy image IO."""

    R: np.ndarray  # [3,3]
    T: np.ndarray  # [3]
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    image_path: str = ""
    image_name: str = ""
    uid: int = 0
    camera_model: int = CameraModelType.PINHOLE
    # OpenCV-style distortion (radial k1..k6, tangential p1 p2), empty if none
    radial_distortion: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    tangential_distortion: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    # filled by the dataset when images are pre-resized
    _cached_image: Optional[np.ndarray] = None

    @property
    def w2c(self) -> np.ndarray:
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = self.R
        m[:3, 3] = self.T
        return m

    @property
    def cam_position(self) -> np.ndarray:
        return (-self.R.T @ self.T).astype(np.float32)

    def fov_x(self) -> float:
        return 2.0 * np.arctan(self.width / (2.0 * self.fx))

    def fov_y(self) -> float:
        return 2.0 * np.arctan(self.height / (2.0 * self.fy))

    def resized(self, factor: float) -> "Camera":
        """Return a camera with image dims and intrinsics scaled by 1/factor."""
        import dataclasses as _dc

        new_w = int(round(self.width / factor))
        new_h = int(round(self.height / factor))
        sx = new_w / self.width
        sy = new_h / self.height
        return _dc.replace(
            self,
            width=new_w,
            height=new_h,
            fx=self.fx * sx,
            fy=self.fy * sy,
            cx=self.cx * sx,
            cy=self.cy * sy,
            _cached_image=None,
        )

    def device_params(self) -> CameraParams:
        return CameraParams(
            w2c=jnp.asarray(self.w2c),
            cam_position=jnp.asarray(self.cam_position),
            K=jnp.asarray([self.fx, self.fy, self.cx, self.cy], jnp.float32),
            uid=jnp.asarray(self.uid, jnp.int32),
            width=self.width,
            height=self.height,
            camera_model=self.camera_model,
            radial=jnp.asarray(self.radial_distortion, jnp.float32)
            if self.radial_distortion.size
            else None,
            tangential=jnp.asarray(self.tangential_distortion, jnp.float32)
            if self.tangential_distortion.size
            else None,
        )

    def load_image(self, cache: bool = False) -> np.ndarray:
        """Load (and resize to the camera's dims) the RGB image as float32 HWC in [0,1].

        Matches reference lazy per-camera image load (camera.hpp:16-120) with
        alpha-over-white compositing for RGBA inputs (transforms datasets)."""
        if self._cached_image is not None:
            return self._cached_image
        from lichtfeld_studio_tpu.io.image import load_image

        img = load_image(self.image_path, self.width, self.height)
        if cache:
            self._cached_image = img
        return img


def look_at_camera(
    eye: np.ndarray,
    target: np.ndarray,
    up: np.ndarray,
    fx: float,
    fy: float,
    width: int,
    height: int,
    uid: int = 0,
) -> Camera:
    """Construct a camera looking from `eye` toward `target` (synthetic tests,
    orbit renders). Camera convention: +z forward, +x right, +y down."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    down /= np.linalg.norm(down)
    # rows of R are camera axes in world coords
    R = np.stack([right, down, fwd], axis=0)
    T = -R @ eye
    return Camera(
        R=R.astype(np.float32),
        T=T.astype(np.float32),
        fx=fx,
        fy=fy,
        cx=width / 2.0,
        cy=height / 2.0,
        width=width,
        height=height,
        uid=uid,
    )
