"""Frame-coherent interactive renderer: reuse one tile binning across
several nearby cameras.

The reference viewer re-bins every frame on an inference-only rasterizer
copy (K25, src/rendering/cuda/) — cheap on a GPU with 2 us radix sorts. On
TPU the per-frame binning (expand + sorts + range extraction) is a large
fixed cost, but interactive camera motion is tiny frame-to-frame, so this
module exploits FRAME COHERENCE instead:

* BIN PASS (every K frames, or when the camera drifts): project with
  CONSERVATIVELY DILATED bounds — every tile the gaussian could touch if
  its projected mean drifted up to `dilate_px` pixels is binned
  (ops/projection.py dilate_px). The instance lists are therefore a
  superset of the exact lists for EVERY camera within the drift budget.
* FRAME PASS (every frame): feature-only projection (the [C, K] exact tile
  test is skipped — binning is reused), pack, and the streaming Pallas
  blend against the CACHED tile assignment. Alpha is evaluated from the
  CURRENT camera's mean/conic, so coverage is exact; only the within-tile
  blend ORDER is the bin camera's depth order, whose deviation over a
  sub-pixel-drift window is below the viewer's u8 quantization.
* RE-BIN TRIGGERS: model identity change, resolution change, estimated
  pixel drift > drift_budget (rotation + translation bound against the
  scene's nearest visible depth), or `max_reuse` frames.

Error bound: a fragment missing from a stale list would need its mean to
have drifted past the dilation, which the drift trigger prevents; the
blend itself always uses current-frame geometry/colors.
"""

from __future__ import annotations

import logging

import numpy as np

_log = logging.getLogger(__name__)

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.core.camera import Camera, CameraParams
from lichtfeld_studio_tpu.core.splat_data import SplatData


def _bin_pass(splats, cam, *, width, height, tile_size, instance_cap, dilate_px):
    from lichtfeld_studio_tpu.ops.projection import project_gaussians
    from lichtfeld_studio_tpu.ops.tiles import build_tile_assignment

    grid_w, grid_h = -(-width // tile_size), -(-height // tile_size)
    proj = project_gaussians(
        splats.means, splats.scaling, splats.rotation, splats.opacity,
        splats.sh0, splats.shN, splats.active_mask(), splats.active_sh_degree,
        cam.w2c, cam.cam_position, cam.K,
        width=width, height=height, tile_size=tile_size,
        exact_tile_cap=32 if tile_size < 32 else 16, dilate_px=dilate_px,
    )
    assignment = build_tile_assignment(
        proj, grid_w=grid_w, grid_h=grid_h, instance_cap=instance_cap,
        chunk_align=1, need_grad=False,
    )
    z_min = jnp.min(jnp.where(proj.valid, proj.depth, jnp.inf))
    return assignment, proj.n_touched, z_min


def _frame_pass(splats, cam, assignment, n_touched, bg,
                *, width, height, tile_size):
    from lichtfeld_studio_tpu.kernels.blend_pallas import (
        blend_pallas_fused,
        pack_stream8,
    )
    from lichtfeld_studio_tpu.ops.projection import project_gaussians

    grid_w, grid_h = -(-width // tile_size), -(-height // tile_size)
    proj = project_gaussians(
        splats.means, splats.scaling, splats.rotation, splats.opacity,
        splats.sh0, splats.shN, splats.active_mask(), splats.active_sh_degree,
        cam.w2c, cam.cam_position, cam.K,
        width=width, height=height, tile_size=tile_size,
        exact_tile_cap=0,  # feature-only: tile lists come from the cache
    )
    packed = pack_stream8(proj)
    # gaussians culled by THIS frame (z/frustum/det) may carry garbage
    # features; zero them so stale instance slots blend to alpha = 0
    packed = jnp.where(proj.valid[None, :], packed, 0.0)
    image, alpha = blend_pallas_fused(
        packed, assignment, n_touched,
        grid_w=grid_w, grid_h=grid_h, tile_size=tile_size,
        exact_alpha=True, freeze=False,
    )
    image = image[:height, :width] + (1.0 - alpha[:height, :width, None]) * bg
    return jnp.clip(image * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)


class CoherentRenderer:
    """Stateful interactive renderer (one per viewer session / resolution).

    render(splats, camera) -> uint8 [H, W, 3]. Any change of model identity
    or image size re-bins automatically; nearby cameras reuse the cached
    binning. Thread-compat: call from one render thread (the live server's
    job queue already serializes renders)."""

    def __init__(self, width: int, height: int, *, tile_size: int = 32,
                 instance_cap: int = 2 ** 21, dilate_px: float = 2.0,
                 drift_budget: float | None = None, max_reuse: int = 120):
        # dilate_px economics (measured, PERFNOTES r4 render section): the
        # dilation inflates the instance count (~+8%/px at bench statistics),
        # which multiplies the gather+blend cost of EVERY reused frame, while
        # re-binning only costs ~9 ms of a 34 ms frame — so small dilation +
        # slow-motion reuse is the only winning regime. 3 px (budget 1.5 px)
        # covers hover/inspection drags; fast drags re-bin per frame, which
        # is the exact (and cheaper) path anyway.
        self.width, self.height = width, height
        self.tile_size = tile_size
        self.instance_cap = instance_cap
        self.dilate_px = float(dilate_px)
        # leave half the dilation as safety margin for the drift ESTIMATE
        # (rotation/translation bound, not an exact reprojection)
        self.drift_budget = drift_budget if drift_budget is not None else 0.5 * dilate_px
        self.max_reuse = max_reuse
        self._build_jits()
        self._cache = None  # (splats_id, w2c, cam_pos, assignment, nt, z_min)
        self._reused = 0
        self.stats = {"bins": 0, "frames": 0}

    def _build_jits(self):
        w, h, ts, cap = self.width, self.height, self.tile_size, self.instance_cap
        self._bin = jax.jit(lambda s, c: _bin_pass(
            s, c, width=w, height=h, tile_size=ts,
            instance_cap=cap, dilate_px=self.dilate_px))
        self._frame = jax.jit(lambda s, c, a, nt, bg: _frame_pass(
            s, c, a, nt, bg, width=w, height=h, tile_size=ts))

    def _drift_px(self, w2c, pos, bin_w2c, bin_pos, z_min: float,
                  fx: float, fy: float) -> float:
        r_new = np.asarray(w2c)[:3, :3]
        r_old = np.asarray(bin_w2c)[:3, :3]
        cosang = (np.trace(r_new @ r_old.T) - 1.0) * 0.5
        ang = float(np.arccos(np.clip(cosang, -1.0, 1.0)))
        dt = float(np.linalg.norm(np.asarray(pos) - np.asarray(bin_pos)))
        f = max(fx, fy)
        # rotation sweeps <= (f + r^2/f) * ang at image radius r (the tan
        # nonlinearity; reaches 2 f ang at 90-degree FOV) — bound at the
        # corner radius of THIS image instead of a fixed wide-FOV constant
        # so wide lenses can't out-drift the dilation at frame corners;
        # translation parallax is bounded by f * |dc| / z_nearest
        cx, cy = 0.5 * self.width, 0.5 * self.height
        corner = f + (cx * cx + cy * cy) / f
        z = max(z_min, 1e-3)
        return corner * ang + f * dt / z

    def render(self, splats: SplatData, camera: Camera | CameraParams,
               bg_color=(0.0, 0.0, 0.0), as_numpy: bool = True):
        """uint8 [H, W, 3]. as_numpy=False returns the DEVICE array (callers
        that composite/encode on device, or benchmarks that must not pay a
        full-frame device->host fetch per frame)."""
        # keep the drift math on HOST copies (Camera fields are numpy) — a
        # per-frame device fetch of w2c/K would cost a relay round-trip
        if isinstance(camera, Camera):
            host_w2c = np.asarray(camera.w2c)
            host_pos = np.asarray(camera.cam_position)
            fx, fy = float(camera.fx), float(camera.fy)
            cam = camera.device_params()
        else:
            cam = camera
            host_w2c = np.asarray(cam.w2c)
            host_pos = np.asarray(cam.cam_position)
            fx, fy = (float(x) for x in np.asarray(cam.K)[:2])
        c = self._cache
        need_bin = (
            c is None
            or c[0] is not splats
            or self._reused >= self.max_reuse
            or self._drift_px(host_w2c, host_pos, c[1], c[2], c[5], fx, fy)
            > self.drift_budget
        )
        if need_bin:
            if c is None or c[0] is not splats:
                # first bin of a new model: probe the true instance count
                # (projection-only, cheap) and seed a snug cap directly —
                # the same sizing render_view does — instead of paying
                # several re-bin + recompile rounds growing from the default
                from lichtfeld_studio_tpu.ops.rasterize import count_instances

                probe = int(count_instances(
                    splats, cam, tile_size=self.tile_size, projection="ewa"
                ))
                # dilation inflates the probe (~8%/px, PERFNOTES r4) —
                # budget for it plus headroom
                need = int(probe * (1.0 + 0.1 * self.dilate_px) * 1.15)
                if need > self.instance_cap:
                    self.instance_cap = min(-(-need // 128) * 128, 2 ** 22)
                    self._build_jits()
            assignment, nt, z_min = self._bin(splats, cam)
            # auto-grow the instance cap when the (dilated) binning overflows
            # — trailing instances would otherwise be silently dropped. Snug
            # x1.25 steps (128-aligned): every binning/gather/blend stage
            # scales with the STATIC cap, so a x2 growth would tax every
            # subsequent frame ~15-25%.
            while (int(assignment.n_instances) > self.instance_cap
                   and self.instance_cap < 2 ** 22):
                need = max(int(self.instance_cap * 1.25),
                           int(int(assignment.n_instances) * 1.1))
                self.instance_cap = min(-(-need // 128) * 128, 2 ** 22)
                self._build_jits()
                assignment, nt, z_min = self._bin(splats, cam)
            if int(assignment.n_instances) > self.instance_cap:
                _log.warning(
                    "coherent renderer: %d instances exceed the %d cap "
                    "ceiling; trailing instances are dropped this frame",
                    int(assignment.n_instances), self.instance_cap,
                )
            self._cache = (
                splats, host_w2c, host_pos, assignment, nt, float(z_min),
            )
            self._reused = 0
            self.stats["bins"] += 1
        else:
            self._reused += 1
        _, _, _, assignment, nt, _ = self._cache
        img = self._frame(splats, cam, assignment, nt,
                          jnp.asarray(bg_color, jnp.float32))
        self.stats["frames"] += 1
        return np.asarray(img) if as_numpy else img
