"""Host-side training orchestration.

Reference: src/training/trainer.{cpp,hpp} (Trainer) + training_setup.cpp.
The reference trainer owns the datasets/strategy/optimizer and runs
train_step with five backward passes, host-synced loss reads and
mutex-guarded model access. Here all device work lives in the single jitted
train_step (train/state.py); this class only: feeds prefetched camera
batches, fetches the loss asynchronously (one scalar, one step behind — no
pipeline stall), triggers eval/save at the scheduled steps, and writes
checkpoints/reports.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lichtfeld_studio_tpu.config.parameters import TrainingParameters
from lichtfeld_studio_tpu.core.splat_data import SplatData
from lichtfeld_studio_tpu.io.dataset import CameraDataset, InfiniteRandomLoader, load_dataset
from lichtfeld_studio_tpu.io.ply import read_ply, write_ply
from lichtfeld_studio_tpu.train.metrics import MetricsEvaluator
from lichtfeld_studio_tpu.train.state import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_lrs,
    train_step,
    train_steps_scanned,
)
from lichtfeld_studio_tpu.train.strategies.mcmc import MCMCConfig


def _default_raster_mode() -> str:
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "tiles"


@dataclass
class Trainer:
    params: TrainingParameters
    train_set: CameraDataset
    val_set: CameraDataset
    state: TrainState
    cfg: TrainConfig
    output_dir: Path
    evaluator: Optional[MetricsEvaluator] = None
    progress_callback: Optional[Callable[[int, float, int], None]] = None
    project: Optional[object] = None  # core.project.Project (.lfs registry)
    # live-control surface (render/live_server.TrainingControl) — the
    # reference's pause/save/stop atomics polled between dispatches
    # (trainer.hpp:199-210); last_progress feeds the live viewer's stats
    control: Optional[object] = None
    last_progress: tuple = (0, None, 0)
    # True while train() runs: tells the live server that between-dispatch
    # jobs WILL be pumped (it must not touch donated state from its thread)
    training_active: bool = False
    _loader: Optional[InfiniteRandomLoader] = None

    @staticmethod
    def setup(params: TrainingParameters) -> "Trainer":
        """Dataset -> SplatData init -> strategy/optimizer -> Trainer
        (reference training_setup.cpp:14-129)."""
        from lichtfeld_studio_tpu.train.capacity import initial_capacity

        opt = params.optimization
        ds = params.dataset
        cameras, pcd, scene_center = load_dataset(
            ds.data_path, ds.images, ds.resize_factor, ds.max_width
        )
        train_set = CameraDataset(cameras, "train", ds.test_every if opt.enable_eval else 0)
        val_set = CameraDataset(cameras, "val", ds.test_every)

        # gaussian-capacity bucketing: start with a snug power-of-two bucket
        # and grow toward max_cap as densification fills it (train/capacity.py)
        if opt.random_init:
            n_init = opt.init_num_pts
        elif params.init_ply:
            n_init = None  # resolved after reading the file
        else:
            n_init = min(pcd.size, opt.max_cap // 2)
        capacity = initial_capacity(n_init, opt.max_cap) if n_init else opt.max_cap
        if params.init_ply:  # warm start (training_setup.cpp:50-71)
            pc = read_ply(params.init_ply)
            capacity = initial_capacity(pc.size, opt.max_cap)
            splats = SplatData.from_arrays(
                pc.means, pc.sh0, pc.shN, pc.scaling, pc.rotation, pc.opacity,
                capacity=capacity,
            )
        elif opt.random_init:
            splats = SplatData.random_init(
                jax.random.PRNGKey(0),
                num_points=opt.init_num_pts,
                extent=opt.init_extent,
                capacity=capacity,
                max_sh_degree=opt.sh_degree,
                init_opacity=opt.init_opacity,
                init_scaling=opt.init_scaling,
            )
        else:
            means = pcd.means
            colors = pcd.colors if pcd.colors is not None else np.full_like(means, 127.0)
            if means.shape[0] > capacity:
                # static capacity: subsample the SfM cloud (reference has no
                # cap; growth headroom matters more than extra seeds)
                sel = np.random.default_rng(0).choice(
                    means.shape[0], capacity // 2, replace=False
                )
                means, colors = means[sel], colors[sel]
            splats = SplatData.from_point_cloud(
                means,
                colors / 255.0,
                scene_center,
                capacity=capacity,
                max_sh_degree=opt.sh_degree,
                init_opacity=opt.init_opacity,
                init_scaling=opt.init_scaling,
            )

        lrs = make_lrs(
            opt.means_lr, opt.shs_lr, opt.scaling_lr, opt.rotation_lr,
            opt.opacity_lr, splats.scene_scale,
        )

        cfg = TrainConfig(
            iterations=opt.iterations,
            lambda_dssim=opt.lambda_dssim,
            scale_reg=opt.scale_reg,
            opacity_reg=opt.opacity_reg,
            raster_mode=_default_raster_mode(),
            tile_size=opt.tile_size,
            # start with a small instance buffer; the train loop grows it
            # (bucketed recompiles) when the scene crowds it — all binning
            # costs scale with this static capacity
            instance_cap=min(2**20, opt.instance_cap),
            # --gut forces the 3DGUT unscented projection even for pinhole
            # cameras (reference trainer.cpp:654-659 dispatch)
            projection="ut" if (opt.gut or opt.gut_exact) else "auto",
            antialiasing=opt.antialiasing,
            gut_exact=opt.gut_exact,
            strategy=opt.strategy,
            mcmc=MCMCConfig(
                max_cap=capacity,  # current bucket; grown toward opt.max_cap
                min_opacity=opt.min_opacity,
                start_refine=opt.start_refine,
                stop_refine=opt.stop_refine,
                refine_every=opt.refine_every,
                sh_degree_interval=opt.sh_degree_interval,
            ),
            lr_gamma=0.01 ** (1.0 / opt.iterations),
            grad_threshold=opt.grad_threshold,
            prune_opacity=opt.prune_opacity,
            grow_scale3d=opt.grow_scale3d,
            grow_scale2d=opt.grow_scale2d,
            prune_scale3d=opt.prune_scale3d,
            prune_scale2d=opt.prune_scale2d,
            reset_every=opt.reset_every,
            pause_refine_after_reset=opt.pause_refine_after_reset,
            revised_opacity=opt.revised_opacity,
            pose_mode=opt.pose_optimization,
            use_bilateral_grid=opt.use_bilateral_grid,
            bilateral_dims=(opt.bilateral_grid_X, opt.bilateral_grid_Y, opt.bilateral_grid_W),
            bilateral_lr=opt.bilateral_grid_lr,
            tv_loss_weight=opt.tv_loss_weight,
            bg_modulation=opt.bg_modulation,
            enable_sparsity=opt.enable_sparsity,
            sparsify_steps=opt.sparsify_steps,
            sparsity_rho=opt.init_rho,
            sparsity_prune_ratio=opt.prune_ratio,
        )

        state = init_train_state(splats, lrs, cfg=cfg, num_cameras=len(cameras))

        output_dir = Path(ds.output_path or "output")
        output_dir.mkdir(parents=True, exist_ok=True)
        evaluator = None
        if opt.enable_eval:
            evaluator = MetricsEvaluator(
                val_set,
                output_dir,
                save_images=opt.enable_save_eval_images,
                raster_mode=cfg.raster_mode,
                instance_cap=opt.instance_cap,
                k_max=cfg.k_max,
                lpips_weights=opt.lpips_weights or None,
                render_mode=opt.render_mode,
                save_depth=opt.save_depth,
                projection=cfg.projection,
                antialiasing=cfg.antialiasing,
            )

        # .lfs project registry (reference application.cpp:25 creates one on
        # every run; outputs registered via addPly, trainer.cpp:1021-1028)
        from lichtfeld_studio_tpu.core.project import Project

        proj_dir = Path(ds.project_path) if ds.project_path else output_dir / "project.lfs"
        project = Project.create(proj_dir, project_name=Path(ds.data_path).name or "scene")
        project.set_params(params.to_json())
        project.save()

        trainer = Trainer(
            params=params,
            train_set=train_set,
            val_set=val_set,
            state=state,
            cfg=cfg,
            output_dir=output_dir,
            evaluator=evaluator,
            project=project,
        )
        if params.resume:
            trainer.restore(params.resume)
        return trainer

    # ------------------------------------------------------------------
    def restore(self, path: str) -> None:
        """Resume from an Orbax training-state snapshot (capability beyond
        the reference — its checkpoints are model exports only, SURVEY §5.4).
        Adopts the snapshot's gaussian capacity before restoring."""
        from lichtfeld_studio_tpu.train.capacity import grow_capacity
        from lichtfeld_studio_tpu.train.checkpoint import load_checkpoint, peek_capacity

        cap = peek_capacity(path)
        if cap is not None and cap != self.state.splats.capacity:
            if cap < self.state.splats.capacity:
                raise ValueError(
                    f"checkpoint capacity {cap} < current {self.state.splats.capacity}; "
                    "shrinking is not supported"
                )
            self.state = grow_capacity(self.state, cap)
            self.cfg = dataclasses.replace(
                self.cfg, mcmc=dataclasses.replace(self.cfg.mcmc, max_cap=cap)
            )
        self.state = load_checkpoint(path, self.state)
        print(
            f"[resume] restored iteration {int(self.state.iteration)} "
            f"({int(self.state.splats.n_active)} gaussians) from {path}",
            flush=True,
        )

    # ------------------------------------------------------------------
    def train(self) -> dict:
        """Main loop (reference trainer.cpp:860-987)."""
        opt = self.params.optimization
        self._loader = InfiniteRandomLoader(
            self.train_set,
            num_workers=opt.num_workers,
            seed=1,
            preload=opt.preload_to_ram,
        )
        bg = jnp.zeros(3)
        eval_steps = set(opt.eval_steps) if opt.enable_eval else set()
        save_steps = set(opt.save_steps) if not opt.skip_intermediate_saving else set()

        # timelapse camera set (reference trainer.cpp:812-846)
        timelapse_cams = [
            c for c in self.train_set.cameras
            if c.image_name in set(self.params.dataset.timelapse_images)
        ]
        timelapse_every = self.params.dataset.timelapse_every

        try:
            from tqdm import tqdm

            pbar = tqdm(total=opt.iterations, desc="train", unit="it", smoothing=0.05)
        except ImportError:
            pbar = None

        # Steps between host-visible boundaries run as ONE device dispatch
        # (lax.scan) to amortize dispatch latency; boundaries (eval/save/
        # timelapse/progress) land on exact iterations.
        dispatch_k = max(1, opt.dispatch_steps)
        state_steps = (
            set(range(opt.save_state_every, opt.iterations + 1, opt.save_state_every))
            if opt.save_state_every > 0 else set()
        )
        boundaries = sorted(
            set(eval_steps) | set(save_steps) | state_steps
            | ({s for s in range(timelapse_every, opt.iterations + 1, timelapse_every)}
               if timelapse_cams else set())
            | {opt.iterations}
        )

        from lichtfeld_studio_tpu.train.state import StepFlags, step_flags

        default_flags = StepFlags()

        from lichtfeld_studio_tpu.core.events import (
            CheckpointSaved,
            EvaluationCompleted,
            TrainingCompleted,
            TrainingProgress,
            bus,
        )

        # --- camera-batch data parallelism over N chips (--devices N):
        # the DP step replaces both train_step and the scan dispatch; one DP
        # step consumes N cameras and counts as one iteration (1/N-averaged
        # gradients == N-step gradient accumulation; see parameters.py) ---
        dp_step = None
        n_dev = max(1, opt.devices)
        if n_dev > 1:
            import numpy as _np

            from jax.sharding import Mesh
            from lichtfeld_studio_tpu.parallel.data_parallel import (
                make_camera_batch,
                make_dp_train_step,
            )

            devs = jax.devices()
            if len(devs) < n_dev:
                raise ValueError(
                    f"--devices {n_dev} but only {len(devs)} JAX devices present"
                )
            mesh = Mesh(_np.asarray(devs[:n_dev]), ("data",))
            cam0 = self.train_set[0]
            dp_cfg = self.cfg
            dp_step = make_dp_train_step(mesh, dp_cfg, cam0.width, cam0.height)
            dp_make_batch = make_camera_batch
            print(f"[dp] camera-batch data parallelism over {n_dev} devices", flush=True)

        pending_loss = None
        t_start = time.time()
        losses = []
        self.training_active = True
        try:
            it = int(self.state.iteration)  # > 0 after --resume
            it0 = it  # starting iteration (throughput accounting excludes it)
            if pbar is not None and it:
                pbar.update(it)
            while it < opt.iterations:
                next_boundary = next((b for b in boundaries if b > it), opt.iterations)
                # scan only full-length uniform default-flag stretches (every
                # distinct scan length is a separate XLA compile); scheduled
                # steps (refine/reset/SH/sparsity events) run as their own
                # statically-compiled variant
                flags_next = step_flags(self.cfg, it + 1)
                uniform = (
                    flags_next == default_flags
                    and next_boundary - it >= dispatch_k
                    and all(
                        step_flags(self.cfg, it + j) == default_flags
                        for j in range(2, dispatch_k + 1)
                    )
                )
                k = dispatch_k if (uniform and dispatch_k > 1) else 1

                if dp_step is not None:
                    if dp_cfg is not self.cfg:  # cap growth -> rebuild (recompile)
                        dp_cfg = self.cfg
                        dp_step = make_dp_train_step(
                            mesh, dp_cfg, cam0.width, cam0.height
                        )
                    cams, imgs = zip(*(next(self._loader) for _ in range(n_dev)))
                    batch, gts = dp_make_batch(list(cams), list(imgs))
                    self.state, metrics = dp_step(
                        self.state, batch, gts, bg, flags_next
                    )
                    last_loss = metrics["loss"]
                    k = 1
                elif k > 1:
                    cams, imgs = zip(*(next(self._loader) for _ in range(k)))
                    from lichtfeld_studio_tpu.parallel.data_parallel import make_camera_batch

                    batch, gts = make_camera_batch(list(cams), list(imgs))
                    from lichtfeld_studio_tpu.core.camera import CameraParams

                    cam0 = cams[0]
                    stacked = CameraParams(
                        w2c=batch["w2c"], cam_position=batch["cam_position"],
                        K=batch["K"], uid=batch["uid"],
                        width=cam0.width, height=cam0.height,
                        camera_model=cam0.camera_model,
                    )
                    self.state, metrics = train_steps_scanned(
                        self.state, stacked, gts, bg, self.cfg, default_flags
                    )
                    last_loss = metrics["loss"][-1]
                else:
                    cam, img = next(self._loader)
                    self.state, metrics = train_step(
                        self.state, cam.device_params(), jnp.asarray(img), bg,
                        self.cfg, flags_next,
                    )
                    last_loss = metrics["loss"]
                it += k

                # read the previous dispatch's loss (device round-trip hidden
                # by this dispatch's compute — replaces sync loss.item)
                if pending_loss is not None:
                    losses.append(float(pending_loss))
                pending_loss = last_loss

                n_bad = int(
                    metrics["n_nonfinite"][-1] if k > 1 else metrics["n_nonfinite"]
                )
                if n_bad:
                    print(
                        f"[health] {n_bad} non-finite parameter entries at iter {it} "
                        f"— numerical fault, see PERFNOTES.md",
                        flush=True,
                    )

                # adaptive instance-buffer bucketing: grow the static cap when
                # the scene's instance count crowds it (each growth is one
                # recompile; capped by the configured instance_cap)
                n_inst = int(
                    metrics["n_instances"][-1] if k > 1 else metrics["n_instances"]
                )
                if (
                    n_inst > 0.85 * self.cfg.instance_cap
                    and self.cfg.instance_cap < opt.instance_cap
                ):
                    # snug x1.25 steps (128-aligned) instead of x2: every
                    # binning/gather/blend stage scales with the static cap,
                    # so a doubled bucket taxes every subsequent step ~15-25%
                    # (same policy as render/coherent.py cap growth)
                    need = max(
                        int(self.cfg.instance_cap * 1.25), int(n_inst * 1.15)
                    )
                    new_cap = min(-(-need // 128) * 128, opt.instance_cap)
                    print(
                        f"[instance-cap] {n_inst} instances crowd "
                        f"{self.cfg.instance_cap}; growing to {new_cap} (recompile)",
                        flush=True,
                    )
                    self.cfg = dataclasses.replace(self.cfg, instance_cap=new_cap)

                # gaussian-capacity bucketing (train/capacity.py): densification
                # approaches the current bucket -> pad state + raise the cap
                cur_cap = self.state.splats.capacity
                if (
                    int(self.state.splats.n_active) > 0.85 * cur_cap
                    and cur_cap < opt.max_cap
                ):
                    from lichtfeld_studio_tpu.train.capacity import grow_capacity

                    new_gcap = min(cur_cap * 2, opt.max_cap)
                    print(
                        f"[capacity] {int(self.state.splats.n_active)} gaussians "
                        f"crowd {cur_cap}; growing to {new_gcap} (recompile)",
                        flush=True,
                    )
                    self.state = grow_capacity(self.state, new_gcap)
                    self.cfg = dataclasses.replace(
                        self.cfg,
                        mcmc=dataclasses.replace(self.cfg.mcmc, max_cap=new_gcap),
                    )

                # the deferred-readback scheme has no previous loss on the
                # very first dispatch; sync the fresh one once rather than
                # reporting a scary (but meaningless) nan
                if not losses:
                    losses.append(float(pending_loss))
                    pending_loss = None
                if pbar is not None:
                    pbar.update(k)
                    pbar.set_postfix(
                        loss=f"{losses[-1]:.4f}",
                        gaussians=int(self.state.splats.n_active),
                    )
                if self.progress_callback:
                    self.progress_callback(
                        it, losses[-1],
                        int(self.state.splats.n_active),
                    )
                bus().emit(TrainingProgress(
                    iteration=it,
                    loss=losses[-1],
                    num_gaussians=int(self.state.splats.n_active),
                    is_refining=flags_next.refine,
                ))
                if timelapse_cams and it % timelapse_every == 0:
                    self._save_timelapse(timelapse_cams, it)
                if it in eval_steps and self.evaluator is not None:
                    m = self.evaluator.evaluate(self.state.splats, it)
                    print(
                        f"[eval] iter {it}: PSNR {m.psnr:.3f} SSIM {m.ssim:.4f} "
                        f"LPIPS {m.lpips:.4f} gaussians {m.num_gaussians}",
                        flush=True,
                    )
                    bus().emit(EvaluationCompleted(
                        iteration=it, psnr=m.psnr, ssim=m.ssim, lpips=m.lpips
                    ))
                if it in save_steps and it != opt.iterations:
                    self.save_ply(it)
                if it in state_steps:
                    self.save_state(it)

                # --- live control (pause/save/stop between dispatches;
                # reference trainer.cpp handle_control_requests) ---
                self.last_progress = (
                    it, losses[-1], int(self.state.splats.n_active)
                )
                if self.control is not None:
                    from lichtfeld_studio_tpu.core.events import (
                        TrainingPaused,
                        TrainingResumed,
                        TrainingStopped,
                    )

                    # live-viewer renders etc. run HERE, between dispatches,
                    # where the (donated) state pytree is guaranteed live
                    self.control.run_pending(self)
                    if self.control.consume_save_request():
                        self.save_ply(it)
                    if self.control.paused and not self.control.stop_requested:
                        bus().emit(TrainingPaused(iteration=it))
                        while self.control.paused and not self.control.stop_requested:
                            self.control.run_pending(self)
                            if self.control.consume_save_request():
                                self.save_ply(it)
                            time.sleep(0.05)
                        bus().emit(TrainingResumed(iteration=it))
                    if self.control.stop_requested:
                        bus().emit(TrainingStopped(iteration=it))
                        print(f"[control] stop requested at iter {it}", flush=True)
                        break
            if pending_loss is not None:
                losses.append(float(pending_loss))
        finally:
            self.training_active = False
            if self.control is not None:
                self.control.run_pending(self)  # drain queued viewer jobs
            self._loader.stop()
            if pbar is not None:
                pbar.close()

        if opt.enable_sparsity:
            self._final_sparsity_prune()
        # `it` is the ACTUAL final iteration — a live-viewer stop may have
        # ended the run early, and --resume started it above zero; label the
        # artifact and compute throughput from what actually ran
        self.save_ply(it)
        if self.evaluator is not None:
            self.evaluator.write_report()
        elapsed = time.time() - t_start
        bus().emit(TrainingCompleted(
            iterations=it, elapsed_s=elapsed,
            final_loss=losses[-1] if losses else float("nan"),
        ))
        return {
            "elapsed_s": elapsed,
            "iters_per_s": max(it - it0, 0) / max(elapsed, 1e-9),
            "final_loss": losses[-1] if losses else float("nan"),
            "num_gaussians": int(self.state.splats.n_active),
        }

    # ------------------------------------------------------------------
    def _save_timelapse(self, cams, iteration: int) -> None:
        """Render named cameras every N iters (reference trainer.cpp:812-846)."""
        import numpy as np

        from lichtfeld_studio_tpu.io.image import save_image
        from lichtfeld_studio_tpu.ops.rasterize import rasterize_jit

        for cam in cams:
            out = rasterize_jit(
                self.state.splats, cam.device_params(), jnp.zeros(3),
                mode=self.cfg.raster_mode, instance_cap=self.cfg.instance_cap,
                k_max=self.cfg.k_max, projection=self.cfg.projection,
                antialiasing=self.cfg.antialiasing,
            )
            d = self.output_dir / "timelapse" / Path(cam.image_name).stem
            d.mkdir(parents=True, exist_ok=True)
            save_image(str(d / f"{iteration:06d}.png"), np.clip(np.asarray(out.image), 0, 1))

    # ------------------------------------------------------------------
    def _final_sparsity_prune(self) -> None:
        """Prune the lowest-opacity `prune_ratio` fraction after the ADMM
        phase (reference trainer.cpp final pruning + remove_gaussians)."""
        import dataclasses

        from lichtfeld_studio_tpu.train.components.sparsity import prune_mask
        from lichtfeld_studio_tpu.train.strategies import adc

        splats = self.state.splats
        mask = prune_mask(
            splats.opacity, splats.active_mask(), splats.n_active,
            self.cfg.sparsity_prune_ratio,
        )
        # reuse the ADC compaction with an opacity override: mark pruned dead
        dead_op = jnp.where(mask[:, None], -20.0, splats.opacity)
        splats = splats.replace_trainable({**splats.trainable_dict(), "opacity": dead_op})
        splats, adam = adc.prune_gs(
            jnp.asarray(0, jnp.int32), splats, self.state.adam, self.cfg
        )
        self.state = dataclasses.replace(self.state, splats=splats, adam=adam)
        print(f"[sparsity] pruned to {int(splats.n_active)} gaussians", flush=True)

    # ------------------------------------------------------------------
    def save_ply(self, iteration: int) -> Path:
        """Export checkpoint (reference trainer.cpp:1008-1028 +
        splat_data.cpp:113-170). Identical on-disk layout to the reference;
        the output is registered in the .lfs project (trainer.cpp:1021-1028)."""
        out = self.output_dir / f"splat_{iteration}.ply"
        pc = self.state.splats.to_point_cloud()
        write_ply(pc, out)
        # live-training view (TrainerManager analog, training_manager.cpp:
        # 121-165): refresh a standalone web viewer at every checkpoint so a
        # browser tab on the output dir shows training progress on reload
        try:
            from lichtfeld_studio_tpu.render.web_viewer import export_html

            export_html(
                pc,
                self.output_dir / "viewer_live.html",
                cameras=self.train_set.cameras[:64],
            )
        except Exception as e:  # viewer export must never kill training
            print(f"[viewer] live export failed: {e}", flush=True)
        if self.params.optimization.save_sog:
            from lichtfeld_studio_tpu.io.sog import write_sog

            write_sog(
                pc,
                self.output_dir / f"splat_{iteration}.sog",
                kmeans_iterations=self.params.optimization.sog_iterations,
            )
        if self.project is not None:
            self.project.add_ply(out.stem, out, iteration=iteration)
            self.project.save()
        from lichtfeld_studio_tpu.core.events import CheckpointSaved, bus

        bus().emit(CheckpointSaved(iteration=iteration, path=str(out)))
        return out

    # ------------------------------------------------------------------
    def save_state(self, iteration: int) -> Path:
        """Periodic full training-state snapshot for --resume
        (train/checkpoint.py; no reference equivalent — SURVEY §5.4)."""
        from lichtfeld_studio_tpu.train.checkpoint import save_checkpoint

        out = self.output_dir / f"state_{iteration}"
        save_checkpoint(self.state, out)
        print(f"[state] snapshot at iter {iteration} -> {out}", flush=True)
        return out
