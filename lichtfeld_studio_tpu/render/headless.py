"""Headless rendering — the TPU replacement for the OpenGL/ImGui viewer.

Reference: the interactive viewer (src/visualizer/, src/rendering/) renders
via an inference-only copy of the fast rasterizer (K25,
src/rendering/cuda/). Headless TPU equivalent: jit the forward rasterizer
once and stream frames to PNG/MP4; the parity target is the >=100 FPS 1080p
headless render path (BASELINE.md), not ImGui.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.core.camera import Camera, look_at_camera
from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.io.image import save_image
from lichtfeld_studio_tpu.io.ply import read_ply
from lichtfeld_studio_tpu.ops.rasterize import rasterize


# Snug instance-cap buckets for adaptive headless rendering: every
# binning/sort/gather stage scales with the STATIC cap, so rendering a
# sparse view at the 2^21 worst-case cap wastes ~cap/true_count of that
# work. Buckets at x1.5 steps keep waste <= 50% worst / ~20% typical while
# bounding recompiles at one per bucket (XLA caches per static shape) —
# the static-shape analogue of the reference's exact per-frame cub
# workspace allocation (fastgs forward.cu:99-127).
_CAP_BUCKETS = [
    1 << 17, 196_608, 1 << 18, 393_216, 1 << 19, 786_432, 1 << 20,
    1_572_864, 1 << 21, 3_145_728, 1 << 22,
]


def _bucket_cap(count: int, margin: float = 1.1) -> int:
    need = int(count * margin) + 1
    for b in _CAP_BUCKETS:
        if b >= need:
            return b
    return _CAP_BUCKETS[-1]


import functools


@functools.partial(jax.jit, static_argnames=("mode", "instance_cap"))
def _render_frame_u8(splats, cam_params, bg, mode: str, instance_cap: int):
    """ONE compiled program for the whole frame (projection -> binning ->
    blend -> u8 quantization). Rasterizing eagerly instead dispatches every
    op through the remote relay separately and never lands in the
    persistent compile cache — measured as tens of minutes for a first
    1080p render on a cold cache vs one cacheable ~minutes compile here
    (and milliseconds warm)."""
    out = rasterize(
        splats, cam_params, bg,
        mode=mode, instance_cap=instance_cap, inference=True,
    )
    # Quantize to u8 ON DEVICE: the headless consumer is an 8-bit image
    # file, and remote-TPU links make f32 framebuffer downloads the
    # bottleneck (a 1080p f32 frame is 24 MB; u8 is 6).
    return jnp.clip(out.image * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)


def render_view(
    splats: SplatData,
    camera: Camera,
    bg_color=(0.0, 0.0, 0.0),
    mode: str | None = None,
    instance_cap: int | None = None,
) -> np.ndarray:
    """instance_cap=None probes the view's true instance count (cheap
    projection-only pass) and picks a snug bucket; pass an explicit cap to
    pin the compiled shape (e.g. for benchmarking)."""
    if mode is None:
        mode = "pallas" if jax.default_backend() in ("tpu", "axon") else "tiles"
    if instance_cap is None:
        from lichtfeld_studio_tpu.ops.rasterize import count_instances

        n = int(jax.jit(count_instances, static_argnames=("tile_size",))(
            splats, camera.device_params(),
            tile_size=32 if mode == "pallas" else 16,
        ))
        instance_cap = _bucket_cap(n)
    img_u8 = _render_frame_u8(
        splats, camera.device_params(), jnp.asarray(bg_color, jnp.float32),
        mode, instance_cap,
    )
    return np.asarray(img_u8).astype(np.float32) / 255.0


def splats_from_ply(path: str | Path, capacity: int | None = None) -> SplatData:
    """Load a splat from .ply or .sog (reference loader facade detection,
    src/loader/loader.cpp:19-80)."""
    from lichtfeld_studio_tpu.io.sog import is_sog, read_sog

    pc = read_sog(path) if is_sog(path) else read_ply(path)
    return SplatData.from_arrays(
        pc.means, pc.sh0, pc.shN, pc.scaling, pc.rotation, pc.opacity,
        capacity=capacity,
    )


def concat_splats(models: list[SplatData]) -> SplatData:
    """Concatenate several splat models into one composite scene (the
    headless analogue of the reference SceneManager's multi-PLY scene graph,
    src/visualizer/scene/scene_manager.cpp — rendering composes all visible
    nodes into one draw)."""
    assert models, "concat_splats needs at least one model"
    if len(models) == 1:
        return models[0]
    pcs = [m.to_point_cloud() for m in models]
    max_k = max(pc.shN.shape[1] for pc in pcs)

    def pad_sh(x):
        if x.shape[1] == max_k:
            return x
        out = np.zeros((x.shape[0], max_k, 3), np.float32)
        out[:, : x.shape[1]] = x
        return out

    return SplatData.from_arrays(
        np.concatenate([pc.means for pc in pcs]),
        np.concatenate([pc.sh0 for pc in pcs]),
        np.concatenate([pad_sh(pc.shN) for pc in pcs]),
        np.concatenate([pc.scaling for pc in pcs]),
        np.concatenate([pc.rotation for pc in pcs]),
        np.concatenate([pc.opacity for pc in pcs]),
        scene_scale=max(float(m.scene_scale) for m in models),
    )


def render_ply_orbit(
    splats_or_path: SplatData | str | Path,
    output: str = "render.png",
    n_frames: int = 1,
    width: int = 1920,
    height: int = 1080,
) -> None:
    """Render one or more orbit views of a splat model (or .ply/.sog path)."""
    splats = (
        splats_or_path
        if isinstance(splats_or_path, SplatData)
        else splats_from_ply(splats_or_path)
    )
    center = np.asarray(jnp.mean(splats.means[: int(splats.n_active)], axis=0))
    radius = 2.5 * splats.scene_scale
    out_path = Path(output)
    t0 = time.time()
    for k in range(n_frames):
        theta = 2.0 * np.pi * k / max(n_frames, 1)
        eye = center + radius * np.array([np.sin(theta), -0.2, np.cos(theta)])
        cam = look_at_camera(
            eye, center, np.array([0.0, -1.0, 0.0]),
            fx=0.8 * width, fy=0.8 * width, width=width, height=height,
        )
        img = render_view(splats, cam)
        path = out_path if n_frames == 1 else out_path.with_stem(f"{out_path.stem}_{k:04d}")
        save_image(str(path), img)
    dt = time.time() - t0
    print(f"rendered {n_frames} frame(s) in {dt:.2f}s ({n_frames/dt:.1f} FPS incl IO)")


def benchmark_fps(
    splats: SplatData,
    width: int = 1920,
    height: int = 1080,
    n_frames: int = 30,
    instance_cap: int = 2**21,
) -> float:
    """Pure render throughput at fixed camera count (device-side only)."""
    center = np.asarray(jnp.mean(splats.means[: int(splats.n_active)], axis=0))
    radius = 2.5 * splats.scene_scale
    mode = "pallas" if jax.default_backend() in ("tpu", "axon") else "tiles"
    bg = jnp.zeros(3)

    cams = []
    for k in range(8):
        theta = 2.0 * np.pi * k / 8
        eye = center + radius * np.array([np.sin(theta), -0.2, np.cos(theta)])
        cams.append(
            look_at_camera(eye, center, np.array([0.0, -1.0, 0.0]),
                           fx=0.8 * width, fy=0.8 * width, width=width, height=height)
        )

    f = jax.jit(
        lambda s, w2c, cp: rasterize(
            s,
            cams[0].device_params().__class__(
                w2c=w2c, cam_position=cp,
                K=jnp.asarray([cams[0].fx, cams[0].fy, cams[0].cx, cams[0].cy], jnp.float32),
                uid=jnp.asarray(0, jnp.int32), width=width, height=height,
            ),
            bg,
            mode=mode,
            instance_cap=instance_cap,
            inference=True,
        ).image
    )
    # warmup
    img = f(splats, jnp.asarray(cams[0].w2c), jnp.asarray(cams[0].cam_position))
    _ = float(img.ravel()[0])
    t0 = time.time()
    for k in range(n_frames):
        c = cams[k % 8]
        img = f(splats, jnp.asarray(c.w2c), jnp.asarray(c.cam_position))
    _ = float(img.ravel()[0])
    return n_frames / (time.time() - t0)
