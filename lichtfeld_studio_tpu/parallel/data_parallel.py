"""Multi-chip camera-batch data parallelism.

The reference is single-process/single-GPU with batch size 1 (SURVEY.md
§2.3: no DDP/NCCL anywhere). On TPU, scaling past one chip is a first-class
concern, and the natural 3DGS axis is *cameras*: the model (N x 59 floats)
fits in every chip's HBM, so we replicate the splats and shard a batch of B
cameras over a 1-D `data` mesh. Each chip renders its own view and
backprops; gradients meet in ONE `psum` over ICI; the strategy update and
Adam then run identically (and redundantly) on every chip, keeping the state
replicated with zero further communication. Batching B cameras per step is
mathematically a B-step gradient accumulation of the reference's loop with
lr scaled by 1/B (we average, matching standard DP practice).

Implementation: `jax.shard_map` over a Mesh — the collectives ride ICI, XLA
overlaps the psum with backward where possible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lichtfeld_studio_tpu.core.camera import Camera, CameraParams
from lichtfeld_studio_tpu.train.state import (
    StepFlags,
    TrainConfig,
    TrainState,
    apply_update,
    compute_grads,
)


def make_camera_batch(cams: list[Camera], images) -> tuple[dict, jax.Array]:
    """Stack host cameras + images into device-shardable arrays."""
    import numpy as np

    batch = {
        "w2c": jnp.asarray(np.stack([c.w2c for c in cams])),
        "cam_position": jnp.asarray(np.stack([c.cam_position for c in cams])),
        "K": jnp.asarray(
            np.stack([[c.fx, c.fy, c.cx, c.cy] for c in cams]).astype(np.float32)
        ),
        "uid": jnp.asarray([c.uid for c in cams], jnp.int32),
    }
    gt = jnp.asarray(np.stack([np.asarray(i) for i in images]))
    return batch, gt


def make_dp_train_step(mesh: Mesh, cfg: TrainConfig, width: int, height: int):
    """Build the jitted data-parallel train step for a given mesh.

    Returns step(state, cam_batch, gt_batch [B,H,W,3], bg [3]) ->
    (state, metrics); B must equal mesh.size along 'data'.
    """
    axis = "data"

    def make_sharded(flags: StepFlags):
        def per_chip(state: TrainState, w2c, campos, K, uid, gt, bg):
            # shard_map hands each chip a leading block of size 1
            cam = CameraParams(
                w2c=w2c[0],
                cam_position=campos[0],
                K=K[0],
                uid=uid[0],
                width=width,
                height=height,
            )
            loss, out, grads = compute_grads(state, cam, gt[0], bg, cfg, flags)
            grads = jax.lax.pmean(grads, axis)  # ONE collective, over ICI
            loss = jax.lax.pmean(loss, axis)
            n_inst = jax.lax.pmax(out.n_instances, axis)
            new_state, metrics = apply_update(state, grads, cfg, loss, out, flags)
            metrics["n_instances"] = n_inst
            return new_state, metrics

        return jax.shard_map(
            per_chip,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("flags",))
    def step(
        state: TrainState, cam_batch: dict, gt: jax.Array, bg: jax.Array,
        flags: StepFlags = StepFlags(),
    ):
        return make_sharded(flags)(
            state,
            cam_batch["w2c"],
            cam_batch["cam_position"],
            cam_batch["K"],
            cam_batch["uid"],
            gt,
            bg,
        )

    return step
