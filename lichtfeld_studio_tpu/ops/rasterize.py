"""Differentiable 3DGS rasterization — the `fast_rasterize` equivalent.

Top-level glue: projection preprocess -> tile binning -> blend -> background
composite (reference call chain: src/training/rasterization/
fast_rasterizer.cpp:12-66 -> fastgs/rasterization/src/forward.cu:15-199).

Backends:
  * "oracle": dense per-pixel blend over all gaussians (tests, tiny scenes)
  * "tiles":  sorted tile pipeline with pure-JAX dense per-tile blend
  * "pallas": sorted tile pipeline with the Pallas streaming blend kernel

Render modes RGB / D / ED / RGB_D / RGB_ED (reference rasterizer.cpp:364-394)
are realized by compositing depth as an extra blend channel: accumulated
depth = sum_i w_i * depth_i, expected depth = that / alpha.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.core.camera import CameraParams
from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.ops import blend_ref
from lichtfeld_studio_tpu.ops.blend_tiles import blend_tiles
from lichtfeld_studio_tpu.ops.projection import project_gaussians
from lichtfeld_studio_tpu.ops.tiles import (
    build_tile_assignment,
    gather_instance_features,
    pack_features,

)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["image", "alpha", "depth", "n_instances", "visibility", "mean2d_grad_accum"],
    meta_fields=["width", "height"],
)
@dataclass
class RenderOutput:
    """Reference: RenderOutput (src/training/rasterization/rasterizer.hpp:13-23)."""

    image: jax.Array  # [H, W, 3]
    alpha: jax.Array  # [H, W]
    depth: jax.Array | None  # [H, W] accumulated depth (None unless requested)
    n_instances: jax.Array  # [] int32 true instance count (overflow detection)
    visibility: jax.Array | None  # [C] bool — gaussian touched any tile
    mean2d_grad_accum: jax.Array | None  # filled by the trainer for ADC
    width: int = 0
    height: int = 0


def count_instances(
    splats: SplatData,
    camera: CameraParams,
    *,
    tile_size: int = 32,
    projection: str = "auto",
) -> jax.Array:
    """Scalar int32: total tile instances this view would bin (sum of exact
    per-gaussian touched-tile counts). A projection-only probe — no sort, no
    blend — used by the headless renderer to pick a snug instance-cap bucket
    before compiling the full frame (the static-shape analogue of the
    reference's per-frame cub workspace sizing, forward.cu:99-127)."""
    from lichtfeld_studio_tpu.core.camera import CameraModelType, ShutterType

    if projection == "auto":
        perfect_pinhole = (
            camera.camera_model == CameraModelType.PINHOLE
            and camera.shutter_type == ShutterType.GLOBAL
        )
        projection = "ewa" if perfect_pinhole else "ut"
    common = dict(width=camera.width, height=camera.height, tile_size=tile_size)
    if projection == "ut":
        from lichtfeld_studio_tpu.ops.ut_projection import project_gaussians_ut

        proj = project_gaussians_ut(
            splats.means, splats.scaling, splats.rotation, splats.opacity,
            splats.sh0, splats.shN, splats.active_mask(),
            splats.active_sh_degree, camera.w2c, camera.cam_position, camera.K,
            camera_model=camera.camera_model, radial=camera.radial,
            tangential=camera.tangential, w2c_end=camera.w2c_end,
            shutter_type=camera.shutter_type, **common,
        )
    else:
        proj = project_gaussians(
            splats.means, splats.scaling, splats.rotation, splats.opacity,
            splats.sh0, splats.shN, splats.active_mask(),
            splats.active_sh_degree, camera.w2c, camera.cam_position, camera.K,
            exact_tile_cap=32 if tile_size < 32 else 16, **common,
        )
    return jnp.sum(proj.n_touched)


def rasterize(
    splats: SplatData,
    camera: CameraParams,
    bg_color: jax.Array,  # [3]
    *,
    mode: str = "tiles",
    tile_size: int | None = None,
    instance_cap: int = 2**20,
    k_max: int = 1024,
    with_depth: bool = False,
    mean2d_offset: jax.Array | None = None,
    projection: str = "auto",  # auto | ewa | ut
    antialiasing: bool = False,
    gut_exact: bool = False,  # exact per-pixel world-space blend (K13/K14)
    inference: bool = False,
    cam_grad: bool = False,  # caller differentiates wrt the camera (pose opt)
) -> RenderOutput:
    """`mean2d_offset` [C,2] is a zero dummy added to the projected means so
    the trainer can read d(loss)/d(mean2d) for ADC densification — the
    functional replacement for the reference's densification_info
    accumulation inside preprocess_backward (kernels_backward.cuh:233-235).

    `projection`: "ewa" is the fastgs frustum-clamped EWA path; "ut" the
    3DGUT unscented-transform path (required for distorted/fisheye/ortho
    cameras); "auto" picks UT whenever the camera is not a perfect pinhole
    (matching trainer.cpp:654-659 fast_rasterize-vs-rasterize dispatch).

    `inference=True` selects the forward-only binning layout (fused sort
    key, no gradient permutation — see build_tile_assignment), the analogue
    of the reference's inference-only viewer rasterizer (K25). Do not
    differentiate through an inference render.

    `tile_size=None` auto-selects: 16 px for training (the backward
    kernel's VMEM working set scales with tile pixels), 32 px for
    inference — wider tiles cut the instance count ~2x (fewer tiles per
    gaussian footprint), shrinking every binning/sort/gather stage, and
    the forward-only Pallas kernel comfortably holds the 1024-pixel tile."""
    if tile_size is None:
        tile_size = 32 if (inference and mode == "pallas") else 16
    width, height = camera.width, camera.height
    grid_w = -(-width // tile_size)
    grid_h = -(-height // tile_size)

    from lichtfeld_studio_tpu.core.camera import CameraModelType

    from lichtfeld_studio_tpu.core.camera import ShutterType

    if projection == "auto":
        perfect_pinhole = (
            camera.camera_model == CameraModelType.PINHOLE
            and camera.shutter_type == ShutterType.GLOBAL
        )
        projection = "ewa" if perfect_pinhole else "ut"

    if projection == "ut":
        from lichtfeld_studio_tpu.ops.ut_projection import project_gaussians_ut

        proj = project_gaussians_ut(
            splats.means,
            splats.scaling,
            splats.rotation,
            splats.opacity,
            splats.sh0,
            splats.shN,
            splats.active_mask(),
            splats.active_sh_degree,
            camera.w2c,
            camera.cam_position,
            camera.K,
            width=width,
            height=height,
            tile_size=tile_size,
            camera_model=camera.camera_model,
            radial=camera.radial,
            tangential=camera.tangential,
            antialiasing=antialiasing,
            w2c_end=camera.w2c_end,
            shutter_type=camera.shutter_type,
            exact_tile_test=not gut_exact,
        )
    else:
        proj = project_gaussians(
            splats.means,
            splats.scaling,
            splats.rotation,
            splats.opacity,
            splats.sh0,
            splats.shN,
            splats.active_mask(),
            splats.active_sh_degree,
            camera.w2c,
            camera.cam_position,
            camera.K,
            width=width,
            height=height,
            tile_size=tile_size,
            antialiasing=antialiasing,
            # coarser tiles -> tiny bboxes; a 16-cell exact test keeps the
            # pruning (covers 4x4-tile footprints) at half the [C, K] cost
            exact_tile_cap=32 if tile_size < 32 else 16,
        )
    if mean2d_offset is not None:
        import dataclasses

        proj = dataclasses.replace(proj, mean2d=proj.mean2d + mean2d_offset)

    if gut_exact and projection == "ut" and mode in ("tiles", "pallas"):
        # exact per-pixel world-space blend (reference rasterize() GUT path,
        # RasterizeToPixelsFromWorld3DGSFwd.cu) — binning by the conservative
        # UT bounds, per-pixel camera-model rays, 3D gaussian evaluation
        from lichtfeld_studio_tpu.ops.world_blend import (
            pack_world_features,
            world_blend_tiles,
            world_ray_table,
        )

        n_ch = 4 if with_depth else 3
        radial = camera.radial if camera.radial is not None else jnp.zeros((0,), jnp.float32)
        tangential = (
            camera.tangential if camera.tangential is not None else jnp.zeros((0,), jnp.float32)
        )
        rays_o, rays_d = world_ray_table(
            camera.w2c, camera.K, camera.camera_model, radial, tangential,
            width, height, tile_size,
            w2c_end=camera.w2c_end, shutter_type=camera.shutter_type,
        )
        # Streaming Pallas path (full-resolution capable, NO k_max
        # truncation): shared-ray-origin identity for GLOBAL shutter, the
        # tau-affine extension for rolling shutters (see
        # kernels/world_blend_pallas.py); not ortho (per-pixel origins).
        # cam_grad (pose optimization) needs d(loss)/d(rays), which the
        # streaming kernel does not propagate — dense fallback.
        use_stream = (
            mode == "pallas"
            and camera.camera_model != CameraModelType.ORTHO
            and not cam_grad
        )
        if use_stream:
            from lichtfeld_studio_tpu.kernels.world_blend_pallas import (
                pack_world_stream,
                pack_world_stream_rs,
                world_blend_pallas,
            )

            assignment = build_tile_assignment(
                proj, grid_w=grid_w, grid_h=grid_h, instance_cap=instance_cap,
                chunk_align=1, need_grad=not inference,
            )
            rolling = (
                camera.shutter_type != ShutterType.GLOBAL
                and camera.w2c_end is not None
            )
            if rolling:
                from lichtfeld_studio_tpu.ops.ut_projection import _shutter_time

                r0, t0 = camera.w2c[:3, :3], camera.w2c[:3, 3]
                r1, t1 = camera.w2c_end[:3, :3], camera.w2c_end[:3, 3]
                o_start = -r0.T @ t0
                o_end = -r1.T @ t1
                hp, wp = grid_h * tile_size, grid_w * tile_size
                ys, xs = jnp.mgrid[0:hp, 0:wp]
                pts = jnp.stack(
                    [xs.astype(jnp.float32) + 0.5, ys.astype(jnp.float32) + 0.5],
                    -1,
                ).reshape(-1, 2)
                tau = _shutter_time(pts, camera.shutter_type, width, height)
                stream = pack_world_stream_rs(
                    splats.means, splats.scaling, splats.rotation,
                    proj.opacity, proj.color, o_start, o_end,
                    proj.depth if with_depth else None,
                )
            else:
                tau = None
                stream = pack_world_stream(
                    splats.means, splats.scaling, splats.rotation,
                    proj.opacity, proj.color, camera.cam_position,
                    proj.depth if with_depth else None,
                )
            image4, alpha = world_blend_pallas(
                stream, rays_d, assignment, proj.n_touched,
                grid_w=grid_w, grid_h=grid_h, tile_size=tile_size,
                n_channels=n_ch, tau=tau,
            )
        else:
            assignment = build_tile_assignment(
                proj, grid_w=grid_w, grid_h=grid_h, instance_cap=instance_cap,
                need_grad=not inference,
            )
            featw = pack_world_features(
                splats.means, splats.scaling, splats.rotation,
                proj.opacity, proj.color,
                proj.depth if with_depth else None,
            )
            feat = gather_instance_features(featw, assignment, proj.n_touched)
            image4, alpha = world_blend_tiles(
                feat, rays_o, rays_d, assignment,
                grid_w=grid_w, grid_h=grid_h, tile_size=tile_size,
                k_max=k_max, n_channels=n_ch,
            )
        image4 = image4[:height, :width]
        alpha = alpha[:height, :width]
        n_instances = assignment.n_instances
        image, depth = _split_depth(image4, with_depth)
        image = image + (1.0 - alpha[..., None]) * bg_color[None, None, :]
        return RenderOutput(
            image=image, alpha=alpha, depth=depth, n_instances=n_instances,
            visibility=proj.valid, mean2d_grad_accum=None,
            width=width, height=height,
        )

    if mode == "oracle":
        color = proj.color
        if with_depth:
            color = jnp.concatenate([color, proj.depth[:, None]], axis=-1)
        image4, alpha = _oracle_with_channels(proj, color, width=width, height=height)
        n_instances = jnp.sum(proj.n_touched)
        image, depth = _split_depth(image4, with_depth)
    elif mode in ("tiles", "pallas"):
        n_ch = 4 if with_depth else 3
        if mode == "pallas":
            from lichtfeld_studio_tpu.kernels.blend_pallas import (
                blend_pallas_fused,
                pack_stream8,
            )

            # compact layout for BOTH training and inference: the forward
            # kernel DMAs from the aligned window under each unaligned start
            # and masks foreign lanes; the backward kernel preserves foreign
            # boundary lanes with a sequential read-merge-write. The
            # chunk-aligned relayout (a position computation + a second
            # full-capacity sort + ~9% buffer slack) is skipped entirely.
            assignment = build_tile_assignment(
                proj, grid_w=grid_w, grid_h=grid_h, instance_cap=instance_cap,
                chunk_align=1, need_grad=not inference,
            )
            image4, alpha = blend_pallas_fused(
                pack_stream8(proj, with_depth),
                assignment,
                proj.n_touched,
                grid_w=grid_w,
                grid_h=grid_h,
                tile_size=tile_size,
                n_channels=n_ch,
                # exact everywhere: a 3-pass bf16-split sigma2 was MEASURED
                # SLOWER than Mosaic's native 6-pass HIGHEST here (three
                # separate [CHUNK,P] matmuls + two adds vs one fused op),
                # so the inference path gains nothing from the looser math
                exact_alpha=True,
                # inference drops the per-pixel transmittance freeze (error
                # < 1e-4 in alpha, under the viewer's u8 step); training
                # keeps reference done-flag semantics for the loss and the
                # compiled-parity gate
                freeze=not inference,
            )
        else:
            assignment = build_tile_assignment(
                proj, grid_w=grid_w, grid_h=grid_h, instance_cap=instance_cap,
                need_grad=not inference,
            )
            feat = gather_instance_features(pack_features(proj, with_depth), assignment, proj.n_touched)
            image4, alpha = blend_tiles(
                feat,
                assignment,
                grid_w=grid_w,
                grid_h=grid_h,
                tile_size=tile_size,
                k_max=k_max,
                n_channels=n_ch,
            )
        image4 = image4[:height, :width]
        alpha = alpha[:height, :width]
        n_instances = assignment.n_instances
        image, depth = _split_depth(image4, with_depth)
    else:
        raise ValueError(f"unknown rasterize mode: {mode}")

    image = image + (1.0 - alpha[..., None]) * bg_color[None, None, :]

    return RenderOutput(
        image=image,
        alpha=alpha,
        depth=depth,
        n_instances=n_instances,
        visibility=proj.valid,
        mean2d_grad_accum=None,
        width=width,
        height=height,
    )


def _split_depth(image: jax.Array, with_depth: bool):
    if with_depth:
        return image[..., :3], image[..., 3]
    return image, None


def _oracle_with_channels(proj, color, *, width: int, height: int):
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    op = jnp.where(proj.valid[order], proj.opacity[order], 0.0)
    col = color[order]
    ys, xs = jnp.mgrid[0:height, 0:width]
    px = xs.reshape(-1).astype(jnp.float32) + 0.5
    py = ys.reshape(-1).astype(jnp.float32) + 0.5
    alphas = blend_ref.compute_alphas(mean2d, conic, op, px, py)
    color_out, t_final = blend_ref.blend_along_axis(alphas, col)
    ch = color.shape[-1]
    return (
        color_out.reshape(height, width, ch),
        (1.0 - t_final).reshape(height, width),
    )


# Whole-frame jitted rasterize for host-loop callers (eval, timelapse,
# headless probes). Rasterizing EAGERLY dispatches every op through the
# remote relay separately and sub-second op compiles never land in the
# persistent cache — measured as tens of minutes for a cold first 1080p
# frame vs one cacheable compile here. All config knobs are static.
rasterize_jit = jax.jit(
    rasterize,
    static_argnames=(
        "mode", "tile_size", "instance_cap", "k_max", "with_depth",
        "projection", "antialiasing", "gut_exact", "inference", "cam_grad",
    ),
)


def apply_render_mode(out: RenderOutput, render_mode: str) -> jax.Array:
    """Compose the final framebuffer per render mode
    (reference rasterizer.cpp:364-394). ED divides by alpha (expected depth)."""
    if render_mode == "RGB":
        return out.image
    assert out.depth is not None, "depth channel not rendered"
    d = out.depth
    if render_mode.endswith("ED"):
        d = d / jnp.maximum(out.alpha, 1e-10)
    if render_mode in ("D", "ED"):
        return d[..., None]
    return jnp.concatenate([out.image, d[..., None]], axis=-1)
