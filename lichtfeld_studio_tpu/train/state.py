"""Training state pytree + the single jitted train step.

This is the TPU-native reshaping of Trainer::train_step
(reference src/training/trainer.cpp:579-858): one compiled function
containing render -> loss -> backward -> strategy post_backward -> Adam step
-> LR schedule. The reference runs five backward passes and several host
syncs per step (loss.item, mask counts); here the whole step is one XLA
program with zero host round-trips — the loss scalar is fetched
asynchronously by the host loop.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial

import jax
import jax.numpy as jnp

from lichtfeld_studio_tpu.core.camera import CameraParams
from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.ops.adam import AdamState, adam_step, init_adam
from lichtfeld_studio_tpu.ops.losses import opacity_reg_loss, photometric_loss, scale_reg_loss
from lichtfeld_studio_tpu.ops.mcmc_ops import make_binoms
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.train.strategies import mcmc as mcmc_strategy
from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig


@dataclass(frozen=True)
class TrainConfig:
    """Static (compile-time) training configuration."""

    iterations: int = 30_000
    lambda_dssim: float = 0.2
    scale_reg: float = 0.01
    opacity_reg: float = 0.01
    raster_mode: str = "tiles"  # oracle | tiles | pallas
    tile_size: int = 32  # 16 matches the reference; 32 is ~1.3x faster on TPU
    instance_cap: int = 2**20
    k_max: int = 1024
    projection: str = "auto"  # auto | ewa | ut (--gut forces "ut")
    antialiasing: bool = False  # Mip-Splatting opacity compensation
    gut_exact: bool = False  # per-pixel world-space blend (K13/K14 exact)
    strategy: str = "mcmc"
    mcmc: MCMCConfig = MCMCConfig()
    lr_gamma: float = 0.01 ** (1.0 / 30_000)  # ExponentialLR (mcmc.cpp:497)
    # ADC (default strategy) parameters — used when strategy == "default"
    grad_threshold: float = 2e-4
    prune_opacity: float = 0.005
    grow_scale3d: float = 0.01
    grow_scale2d: float = 0.05
    prune_scale3d: float = 0.1
    prune_scale2d: float = 0.15
    reset_every: int = 3_000
    pause_refine_after_reset: int = 0
    revised_opacity: bool = False
    # --- optional training components ---
    pose_mode: str = "none"  # none | direct | mlp (trainer.cpp:384-386)
    pose_lr: float = 1e-5
    pose_mlp_depth: int = 2
    use_bilateral_grid: bool = False
    bilateral_dims: tuple[int, int, int] = (16, 16, 8)  # (X, Y, W) grid dims
    bilateral_lr: float = 2e-3
    tv_loss_weight: float = 10.0
    bg_modulation: bool = False  # sinusoidal bg mixing (trainer.cpp:497-577)
    enable_sparsity: bool = False  # ADMM opacity sparsification phase
    sparsify_steps: int = 15_000
    sparsity_rho: float = 5e-4
    sparsity_prune_ratio: float = 0.6

    @property
    def base_iterations(self) -> int:
        """Iterations before the sparsification phase (trainer.cpp:622-646)."""
        return self.iterations - self.sparsify_steps if self.enable_sparsity else self.iterations


@dataclass(frozen=True)
class StepFlags:
    """Static per-step schedule flags.

    Every schedule in the reference (refine cadence, SH stepping, opacity
    reset, sparsity phases) is a function of the iteration number alone, so
    the host knows it in advance. Passing these as *static* arguments
    compiles a handful of step variants instead of carrying lax.cond
    branches — XLA conditionals copy their operands (the full ~1 GB state),
    which measured ~10x slower than just compiling the branch in, and they
    pessimize badly inside lax.scan."""

    refine: bool = False
    sh_step: bool = False
    reset: bool = False
    sparsity_phase: bool = False
    admm_init: bool = False
    admm_update: bool = False
    # shN frozen for iter <= 1000 (FusedAdam heuristic, fused_adam.cpp:69-71).
    # STATIC so the frozen variant omits the [C,15,3] moment/param update
    # entirely (the reference skips the kernel launch; a traced select still
    # paid the full ~540 MB of moment traffic every early step).
    shn_frozen: bool = False


def step_flags(cfg: TrainConfig, iteration: int) -> StepFlags:
    """Compute the flags for a (1-based) iteration — mirrors is_refining
    (mcmc.cpp:500-505 / default_strategy.cpp:31-35) and the trainer's phase
    gates."""
    m = cfg.mcmc
    in_sparsity = cfg.enable_sparsity and iteration > cfg.base_iterations
    if cfg.strategy == "mcmc":
        refine = (
            not in_sparsity
            and m.start_refine < iteration < m.stop_refine
            and iteration % m.refine_every == 0
        )
        reset = False
    else:
        refine = (
            not in_sparsity
            and iteration > m.start_refine
            and iteration < m.stop_refine
            and iteration % m.refine_every == 0
            and iteration % cfg.reset_every >= cfg.pause_refine_after_reset
        )
        # opacity resets ONLY inside the refinement window: the reference's
        # post_backward returns before the reset once iter >= stop_refine
        # (default_strategy.cpp:304-318). Without this gate a reset landing
        # on/after stop_refine never recovers (no refinement follows) — the
        # 30k ADC protocol measured 29.2 dB at 7.5k collapsing to 10.8 dB at
        # 30k from a reset at the final step.
        reset = (
            not in_sparsity
            and iteration % cfg.reset_every == 0
            and iteration > 0
            and iteration < m.stop_refine
        )
    return StepFlags(
        refine=refine,
        sh_step=iteration % m.sh_degree_interval == 0,
        reset=reset,
        sparsity_phase=in_sparsity,
        admm_init=cfg.enable_sparsity and iteration == cfg.base_iterations + 1,
        admm_update=in_sparsity and iteration % 50 == 0,
        shn_frozen=iteration <= 1000,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "splats", "adam", "key", "iteration", "binoms", "densify_count",
        "densify_grad", "aux_params", "aux_adam", "admm_u", "admm_z",
    ],
    meta_fields=[],
)
@dataclass
class TrainState:
    splats: SplatData
    adam: AdamState
    key: jax.Array
    iteration: jax.Array  # [] int32, 0-based count of completed steps
    binoms: jax.Array  # [51, 51] MCMC binomial table
    # ADC densification stats (reference _densification_info [2, N],
    # splat_data.hpp:97): visible count + pixel-scaled mean2d grad-norm sums
    densify_count: jax.Array  # [C]
    densify_grad: jax.Array  # [C]
    # auxiliary trainables: {"pose": {...}} and/or {"bilateral": [N,12,L,H,W]}
    aux_params: dict
    aux_adam: AdamState
    # ADMM sparsity duals ([C]; zeros when sparsity disabled)
    admm_u: jax.Array
    admm_z: jax.Array


def make_lrs(opt_means_lr: float, shs_lr: float, scaling_lr: float,
             rotation_lr: float, opacity_lr: float, scene_scale: float) -> dict[str, float]:
    """Per-group LRs (reference mcmc.cpp:487-492): means lr is scaled by the
    scene scale; shN uses shs_lr / 20."""
    return {
        "means": opt_means_lr * scene_scale,
        "sh0": shs_lr,
        "shN": shs_lr / 20.0,
        "scaling": scaling_lr,
        "rotation": rotation_lr,
        "opacity": opacity_lr,
    }


def init_train_state(
    splats: SplatData,
    lrs: dict[str, float],
    seed: int = 0,
    cfg: TrainConfig | None = None,
    num_cameras: int = 0,
) -> TrainState:
    c = splats.capacity
    aux_params: dict = {}
    aux_lrs: dict = {}
    if cfg is not None and cfg.pose_mode != "none":
        from lichtfeld_studio_tpu.train.components.poseopt import init_pose_params

        aux_params["pose"] = init_pose_params(
            cfg.pose_mode, num_cameras, depth=cfg.pose_mlp_depth,
            key=jax.random.PRNGKey(seed + 7),
        )
        aux_lrs["pose"] = cfg.pose_lr
    if cfg is not None and cfg.use_bilateral_grid:
        from lichtfeld_studio_tpu.train.components.bilateral_grid import identity_grids

        x, y, w = cfg.bilateral_dims
        aux_params["bilateral"] = identity_grids(num_cameras, grid_w=x, grid_h=y, grid_l=w)
        aux_lrs["bilateral"] = cfg.bilateral_lr
    return TrainState(
        splats=splats,
        adam=init_adam(splats.trainable_dict(), lrs),
        key=jax.random.PRNGKey(seed),
        iteration=jnp.asarray(0, jnp.int32),
        binoms=make_binoms(),
        densify_count=jnp.zeros((c,), jnp.float32),
        densify_grad=jnp.zeros((c,), jnp.float32),
        aux_params=aux_params,
        aux_adam=init_adam(aux_params, aux_lrs),
        admm_u=jnp.zeros((c,), jnp.float32),
        admm_z=jnp.zeros((c,), jnp.float32),
    )


def compute_grads(
    state: TrainState,
    camera: CameraParams,
    gt_image: jax.Array,  # [H, W, 3]
    bg_color: jax.Array,  # [3]
    cfg: TrainConfig,
    flags: StepFlags = StepFlags(),
):
    """Render + loss + backward for one camera. Split from apply_update so
    the data-parallel wrapper (parallel/data_parallel.py) can psum gradients
    between the two halves."""

    need_m2d = cfg.strategy == "default"
    iteration = state.iteration + 1

    # Per-step background (optionally sine-modulated, trainer.cpp:497-577)
    bg_key = jax.random.fold_in(state.key, 17)
    if cfg.bg_modulation:
        from lichtfeld_studio_tpu.train.components.background import background_for_step

        bg_color = background_for_step(bg_color, iteration, bg_key, cfg.iterations, True)

    def loss_fn(params):
        m2d_dummy = params.pop("_mean2d", None)
        aux = params.pop("_aux", {})
        cam = camera
        if cfg.pose_mode != "none":
            from lichtfeld_studio_tpu.train.components.poseopt import apply_pose_opt

            w2c_adj = apply_pose_opt(
                cfg.pose_mode, aux["pose"], camera.w2c, camera.uid, cfg.pose_mlp_depth
            )
            cam_pos = -w2c_adj[:3, :3].T @ w2c_adj[:3, 3]
            cam = CameraParams(
                w2c=w2c_adj, cam_position=cam_pos, K=camera.K, uid=camera.uid,
                width=camera.width, height=camera.height,
            )
        s = state.splats.replace_trainable(params)
        out = rasterize(
            s,
            cam,
            bg_color,
            mode=cfg.raster_mode,
            tile_size=cfg.tile_size,
            instance_cap=cfg.instance_cap,
            k_max=cfg.k_max,
            mean2d_offset=m2d_dummy,
            projection=cfg.projection,
            antialiasing=cfg.antialiasing,
            gut_exact=cfg.gut_exact,
            cam_grad=cfg.pose_mode != "none",
        )
        image = out.image
        if cfg.use_bilateral_grid:
            from lichtfeld_studio_tpu.train.components.bilateral_grid import (
                apply_bilateral_grid,
                tv_loss,
            )

            image = apply_bilateral_grid(aux["bilateral"], image, camera.uid)

        loss = photometric_loss(image, gt_image, cfg.lambda_dssim)
        loss = loss + scale_reg_loss(s, cfg.scale_reg)
        loss = loss + opacity_reg_loss(s, cfg.opacity_reg)
        if cfg.use_bilateral_grid:
            loss = loss + cfg.tv_loss_weight * tv_loss(aux["bilateral"])
        if cfg.enable_sparsity and flags.sparsity_phase:
            from lichtfeld_studio_tpu.train.components.sparsity import sparsity_loss
            from lichtfeld_studio_tpu.train.components.sparsity import ADMMState

            loss = loss + sparsity_loss(
                params["opacity"], s.active_mask(),
                ADMMState(u=state.admm_u, z=state.admm_z), cfg.sparsity_rho,
            )
        return loss, out

    params = dict(state.splats.trainable_dict())
    if need_m2d:
        # zero dummy whose gradient is d(loss)/d(mean2d) — feeds the ADC
        # densification stats (reference kernels_backward.cuh:233-235)
        params["_mean2d"] = jnp.zeros((state.splats.capacity, 2), jnp.float32)
    if state.aux_params:
        params["_aux"] = state.aux_params
    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, out, grads


def apply_update(
    state: TrainState,
    grads: dict,
    cfg: TrainConfig,
    loss: jax.Array,
    out,
    flags: StepFlags = StepFlags(),
) -> tuple[TrainState, dict]:
    """Strategy post_backward + Adam + LR schedule (the reference's
    post_backward -> step ordering, trainer.cpp:745-758). `flags` selects
    the statically-compiled step variant (see StepFlags)."""
    iteration = state.iteration + 1  # 1-based, like the reference loop

    # --- strategy post_backward BEFORE the optimizer step (trainer.cpp:745-758) ---
    key, sub = jax.random.split(state.key)
    splats = state.splats
    adam = state.adam
    densify_count, densify_grad = state.densify_count, state.densify_grad
    grads = dict(grads)
    dmean2d = grads.pop("_mean2d", None)
    aux_grads = grads.pop("_aux", {})

    if cfg.strategy == "mcmc":
        # post_backward skipped during sparsification (trainer.cpp:744-754)
        if not flags.sparsity_phase:
            splats, adam = mcmc_strategy.post_backward(
                sub, iteration, splats, adam, state.binoms, cfg.mcmc,
                refine=flags.refine, sh_step=flags.sh_step,
            )
    elif cfg.strategy == "default":
        from lichtfeld_studio_tpu.train.strategies import adc

        # accumulate densification stats from this step's mean2d grads
        # (reference kernels_backward.cuh:233-235: pixel-scaled grad norms)
        vis = out.visibility.astype(jnp.float32)
        half = jnp.asarray([0.5 * out.width, 0.5 * out.height], jnp.float32)
        gnorm = jnp.linalg.norm(dmean2d * half[None, :], axis=-1)
        densify_count = densify_count + vis
        densify_grad = densify_grad + jnp.where(out.visibility, gnorm, 0.0)

        if not flags.sparsity_phase:
            splats, adam, densify_count, densify_grad = adc.post_backward(
                sub, iteration, splats, adam, densify_count, densify_grad, cfg,
                refine=flags.refine, sh_step=flags.sh_step, reset=flags.reset,
            )
    else:
        raise ValueError(f"unknown strategy {cfg.strategy}")

    # --- ADMM dual updates every 50 steps inside the sparsity phase
    # (sparsity_optimizer.cpp:85-91; trainer.cpp:744-754) ---
    admm_u, admm_z = state.admm_u, state.admm_z
    if flags.admm_init or flags.admm_update:
        from lichtfeld_studio_tpu.train.components.sparsity import (
            ADMMState,
            init_admm,
            update_admm,
        )

        active = splats.active_mask()
        if flags.admm_init:
            st = init_admm(
                splats.opacity, active, splats.n_active, cfg.sparsity_prune_ratio
            )
        else:
            st = update_admm(
                splats.opacity, active, splats.n_active,
                ADMMState(u=admm_u, z=admm_z), cfg.sparsity_prune_ratio,
            )
        admm_u, admm_z = st.u, st.z

    # --- Adam step on the (possibly relocated) params with this step's grads ---
    params, adam = adam_step(
        splats.trainable_dict(), grads, adam,
        static_skip=("shN",) if flags.shn_frozen else (),
    )
    splats = splats.replace_trainable(params)

    # --- ExponentialLR on the means group only (mcmc.cpp:497-498: index 0) ---
    adam = replace(
        adam, lr={**adam.lr, "means": adam.lr["means"] * jnp.float32(cfg.lr_gamma)}
    )

    # --- auxiliary params (pose / bilateral grid) with their own Adam ---
    aux_params, aux_adam = state.aux_params, state.aux_adam
    if aux_params:
        if cfg.use_bilateral_grid:
            from lichtfeld_studio_tpu.train.components.bilateral_grid import (
                warmup_exponential_lr,
            )

            aux_adam = replace(
                aux_adam,
                lr={
                    **aux_adam.lr,
                    "bilateral": warmup_exponential_lr(
                        cfg.bilateral_lr, iteration, cfg.iterations
                    ),
                },
            )
        aux_params, aux_adam = adam_step(aux_params, aux_grads, aux_adam)

    new_state = TrainState(
        splats=splats, adam=adam, key=key, iteration=iteration, binoms=state.binoms,
        densify_count=densify_count, densify_grad=densify_grad,
        aux_params=aux_params, aux_adam=aux_adam, admm_u=admm_u, admm_z=admm_z,
    )
    metrics = {
        "loss": loss,
        "n_active": splats.n_active,
        "n_instances": out.n_instances,
        # health sentinel: non-finite parameter rows (cheap reduce; a NaN
        # anywhere in the state shows up here the same step it appears)
        "n_nonfinite": jnp.sum(~jnp.isfinite(splats.means)) + jnp.sum(~jnp.isfinite(splats.scaling)),
    }
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg", "flags"), donate_argnames=("state",))
def train_step(
    state: TrainState,
    camera: CameraParams,
    gt_image: jax.Array,  # [H, W, 3]
    bg_color: jax.Array,  # [3]
    cfg: TrainConfig,
    flags: StepFlags = StepFlags(),
) -> tuple[TrainState, dict]:
    """Single-chip train step: one camera per step, like the reference
    (batch size 1, dataset.hpp:242). `flags` selects the compiled variant
    for scheduled work (refine / SH step / reset / sparsity)."""
    loss, out, grads = compute_grads(state, camera, gt_image, bg_color, cfg, flags)
    return apply_update(state, grads, cfg, loss, out, flags)


@partial(jax.jit, static_argnames=("cfg", "flags"), donate_argnames=("state",))
def train_steps_scanned(
    state: TrainState,
    cameras: CameraParams,  # leaves stacked with leading [K]
    gt_images: jax.Array,  # [K, H, W, 3]
    bg_color: jax.Array,  # [3]
    cfg: TrainConfig,
    flags: StepFlags = StepFlags(),
) -> tuple[TrainState, dict]:
    """K sequential train steps in ONE device dispatch (lax.scan).

    Same math as K calls to train_step; exists purely to amortize host
    dispatch latency (the reference never needs this — its driver sits on
    the PCIe bus; a remote TPU pays a round trip per dispatch). All K steps
    share `flags`, so the trainer only scans uniform stretches between
    scheduled events (refine/reset/SH) — which also keeps heavy branches
    out of the scan body. Returns stacked [K] metrics."""

    def body(st, xs):
        w2c, campos, K_, uid, gt = xs
        cam = CameraParams(
            w2c=w2c, cam_position=campos, K=K_, uid=uid,
            width=cameras.width, height=cameras.height,
            camera_model=cameras.camera_model,
        )
        loss, out, grads = compute_grads(st, cam, gt, bg_color, cfg, flags)
        st, metrics = apply_update(st, grads, cfg, loss, out, flags)
        return st, metrics

    state, metrics = jax.lax.scan(
        body,
        state,
        (cameras.w2c, cameras.cam_position, cameras.K, cameras.uid, gt_images),
    )
    return state, metrics
