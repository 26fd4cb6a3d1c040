"""Command-line interface.

Reference: src/core/argument_parser.cpp (~45 flags, three-stage config:
CLI parse -> strategy JSON defaults -> CLI overrides -> steps_scaler).
Flag names and semantics match so reference invocations port directly:

    lfs-tpu --data-path <dir> --output-path <dir> --headless --eval ...
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

from lichtfeld_studio_tpu.config.parameters import (
    DatasetConfig,
    OptimizationParameters,
    TrainingParameters,
    apply_step_scaling,
    load_optim_params_from_json,
    preset_for_strategy,
)

RENDER_MODES = {"RGB", "D", "ED", "RGB_D", "RGB_ED"}
POSE_MODES = {"none", "direct", "mlp"}
STRATEGIES = {"mcmc", "default"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lfs-tpu",
        description="LichtFeld-Studio-TPU: TPU-native 3D Gaussian Splatting",
    )
    # dataset
    p.add_argument("-d", "--data-path", type=str, default="")
    p.add_argument("-o", "--output-path", type=str, default="output")
    p.add_argument("--project-path", type=str, default="")
    p.add_argument("--images", type=str, default="images")
    p.add_argument("-r", "--resize-factor", type=int, default=-1)
    p.add_argument("--max-width", type=int, default=3840)
    p.add_argument("--test-every", type=int, default=8)
    p.add_argument("--timelapse-every", type=int, default=50)
    p.add_argument("--timelapse-images", type=str, nargs="*", default=[])
    # core training
    p.add_argument("-i", "--iterations", type=int, default=None)
    p.add_argument("--strategy", type=str, default="mcmc", choices=sorted(STRATEGIES))
    p.add_argument("--config", type=str, default="", help="JSON optimization params")
    p.add_argument("--sh-degree", type=int, default=None)
    p.add_argument("--max-cap", type=int, default=None)
    p.add_argument("--min-opacity", type=float, default=None)
    p.add_argument("--refine-every", type=int, default=None)
    p.add_argument("--start-refine", type=int, default=None)
    p.add_argument("--stop-refine", type=int, default=None)
    p.add_argument("--grad-threshold", type=float, default=None)
    p.add_argument("--opacity-reg", type=float, default=None)
    p.add_argument("--scale-reg", type=float, default=None)
    p.add_argument("--steps-scaler", type=float, default=None)
    # ADC (default strategy) parameters
    p.add_argument("--prune-opacity", type=float, default=None)
    p.add_argument("--grow-scale3d", type=float, default=None)
    p.add_argument("--grow-scale2d", type=float, default=None)
    p.add_argument("--prune-scale3d", type=float, default=None)
    p.add_argument("--prune-scale2d", type=float, default=None)
    p.add_argument("--reset-every", type=int, default=None)
    p.add_argument("--pause-refine-after-reset", type=int, default=None)
    p.add_argument("--revised-opacity", action="store_true")
    p.add_argument("--sh-degree-interval", type=int, default=None,
                   help="iterations between SH degree increments")
    p.add_argument("--save-depth", action="store_true",
                   help="save eval depth colormaps (forces a depth channel)")
    p.add_argument("--eval", action="store_true", help="enable evaluation")
    p.add_argument("--headless", action="store_true")
    p.add_argument("--render-mode", type=str, default=None, choices=sorted(RENDER_MODES))
    p.add_argument("--pose-optimization", type=str, default=None, choices=sorted(POSE_MODES))
    p.add_argument("--preload-to-ram", action="store_true")
    p.add_argument("--bg-modulation", action="store_true")
    p.add_argument("--antialiasing", action="store_true")
    p.add_argument("--gut", action="store_true")
    p.add_argument("--gut-exact", action="store_true", dest="gut_exact",
                   help="per-pixel world-space GUT blend (exact, slower)")
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--skip-intermediate", action="store_true")
    p.add_argument("--save-eval-images", action="store_true", default=None)
    p.add_argument("--eval-steps", type=int, nargs="*", default=None)
    p.add_argument("--save-steps", type=int, nargs="*", default=None)
    # bilateral grid
    p.add_argument("--bilateral-grid", action="store_true")
    p.add_argument("--bilateral-grid-x", type=int, default=None)
    p.add_argument("--bilateral-grid-y", type=int, default=None)
    p.add_argument("--bilateral-grid-w", type=int, default=None)
    p.add_argument("--tv-loss-weight", type=float, default=None)
    # init
    p.add_argument("--init-ply", type=str, default=None)
    p.add_argument("--random", action="store_true", dest="random_init")
    p.add_argument("--init-num-pts", type=int, default=None)
    p.add_argument("--init-extent", type=float, default=None)
    # sparsity
    p.add_argument("--sparsity", action="store_true", dest="enable_sparsity")
    p.add_argument("--sparsify-steps", type=int, default=None)
    p.add_argument("--prune-ratio", type=float, default=None)
    p.add_argument("--init-rho", type=float, default=None)
    # export
    p.add_argument("--sog", action="store_true", dest="save_sog")
    p.add_argument("--sog-iterations", type=int, default=None)
    # metrics / resume
    p.add_argument("--lpips-weights", type=str, default=None,
                   help="VGG-LPIPS weights npz (enables the lpips column)")
    p.add_argument("--save-state-every", type=int, default=None,
                   help="snapshot full training state every N iters")
    p.add_argument("--resume", type=str, default="",
                   help="resume from a state snapshot directory")
    # viewer / render
    p.add_argument("-v", "--view", type=str, default="",
                   help="render splat file(s) headlessly; comma-separate "
                        "multiple .ply/.sog for a multi-model scene "
                        "(composite render / viewer with visibility toggles)")
    p.add_argument("--render-output", type=str, default="render.png")
    p.add_argument(
        "--render-size", type=int, nargs=2, default=[1920, 1080],
        metavar=("W", "H"), help="headless render resolution",
    )
    p.add_argument("--viewer-max-points", type=int, default=1_000_000,
                   help="embed size cap for the HTML viewer export")
    p.add_argument("--live-viewer", type=int, default=None, metavar="PORT",
                   help="serve a live training viewer with pause/resume/"
                        "save/stop controls on this port (0 = ephemeral)")
    # TPU-specific
    p.add_argument("--instance-cap", type=int, default=None)
    p.add_argument("--dispatch-steps", type=int, default=None,
                   help="steps fused into one device dispatch (lax.scan)")
    p.add_argument("--devices", type=int, default=None,
                   help="camera-batch data parallelism over N chips")
    p.add_argument("--log-level", type=str, default="info")
    return p


_OVERRIDE_MAP = {
    # argparse dest -> OptimizationParameters field
    "iterations": "iterations",
    "sh_degree": "sh_degree",
    "sh_degree_interval": "sh_degree_interval",
    "max_cap": "max_cap",
    "min_opacity": "min_opacity",
    "refine_every": "refine_every",
    "start_refine": "start_refine",
    "stop_refine": "stop_refine",
    "grad_threshold": "grad_threshold",
    "opacity_reg": "opacity_reg",
    "scale_reg": "scale_reg",
    "steps_scaler": "steps_scaler",
    "render_mode": "render_mode",
    "pose_optimization": "pose_optimization",
    "num_workers": "num_workers",
    "eval_steps": "eval_steps",
    "save_steps": "save_steps",
    "bilateral_grid_x": "bilateral_grid_X",
    "bilateral_grid_y": "bilateral_grid_Y",
    "bilateral_grid_w": "bilateral_grid_W",
    "tv_loss_weight": "tv_loss_weight",
    "init_num_pts": "init_num_pts",
    "init_extent": "init_extent",
    "sparsify_steps": "sparsify_steps",
    "prune_ratio": "prune_ratio",
    "init_rho": "init_rho",
    "sog_iterations": "sog_iterations",
    "instance_cap": "instance_cap",
    "dispatch_steps": "dispatch_steps",
    "devices": "devices",
    "lpips_weights": "lpips_weights",
    "save_state_every": "save_state_every",
    "save_eval_images": "enable_save_eval_images",
    "prune_opacity": "prune_opacity",
    "grow_scale3d": "grow_scale3d",
    "grow_scale2d": "grow_scale2d",
    "prune_scale3d": "prune_scale3d",
    "prune_scale2d": "prune_scale2d",
    "reset_every": "reset_every",
    "pause_refine_after_reset": "pause_refine_after_reset",
}
_FLAG_MAP = {
    "eval": "enable_eval",
    "headless": "headless",
    "preload_to_ram": "preload_to_ram",
    "bg_modulation": "bg_modulation",
    "antialiasing": "antialiasing",
    "gut": "gut",
    "gut_exact": "gut_exact",
    "skip_intermediate": "skip_intermediate_saving",
    "bilateral_grid": "use_bilateral_grid",
    "random_init": "random_init",
    "enable_sparsity": "enable_sparsity",
    "save_sog": "save_sog",
    "revised_opacity": "revised_opacity",
    "save_depth": "save_depth",
}


def parse_args_and_params(argv: list[str] | None = None) -> TrainingParameters:
    """Three-stage config resolution
    (reference argument_parser.cpp:447-492 + apply_cmd_overrides :322-413)."""
    args = build_parser().parse_args(argv)

    # 1. strategy-selected JSON defaults (or explicit --config)
    if args.config:
        opt = load_optim_params_from_json(args.config)
    else:
        opt = preset_for_strategy(args.strategy)
    opt = dataclasses.replace(opt, strategy=args.strategy)

    # 2. CLI overrides on top of JSON
    upd = {}
    for dest, fieldname in _OVERRIDE_MAP.items():
        v = getattr(args, dest, None)
        if v is not None:
            upd[fieldname] = v
    for dest, fieldname in _FLAG_MAP.items():
        if getattr(args, dest, False):
            upd[fieldname] = True
    opt = dataclasses.replace(opt, **upd)

    # 3. steps_scaler rescaling
    opt = apply_step_scaling(opt)

    ds = DatasetConfig(
        data_path=args.data_path,
        output_path=args.output_path,
        project_path=args.project_path,
        images=args.images,
        resize_factor=args.resize_factor,
        test_every=args.test_every,
        timelapse_images=args.timelapse_images,
        timelapse_every=args.timelapse_every,
        max_width=args.max_width,
    )
    return TrainingParameters(
        dataset=ds, optimization=opt, ply_path=args.view, init_ply=args.init_ply,
        resume=args.resume,
    )


def _enable_compile_cache() -> None:
    """Persist XLA compiles across CLI runs. A cold compile of the train
    step takes minutes on a small host driving a remote TPU; the cache turns
    every repeat invocation (same shapes/flags) into a ~1 s load."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpu_cache")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv: list[str] | None = None) -> int:
    params = parse_args_and_params(argv)
    args = build_parser().parse_args(argv)
    _enable_compile_cache()

    from lichtfeld_studio_tpu.core.logging import setup_logging

    setup_logging(args.log_level)

    if params.ply_path:  # headless render / interactive viewer export
        import os

        # comma-separated paths = multi-model scene (the reference
        # SceneManager loads multiple PLYs into one scene graph,
        # src/visualizer/scene/scene_manager.cpp); whitespace around the
        # separators is stripped so "-v a.ply, b.ply" works
        paths = [p.strip() for p in str(params.ply_path).split(",") if p.strip()]
        for p_ in paths:
            if not os.path.exists(p_):
                print(f"error: splat file not found: {p_}", file=sys.stderr)
                return 2
        if str(args.render_output).endswith(".html"):
            # the WebGL export never touches the accelerator — keep the
            # splat tensors on host instead of paying a relay H2D upload
            # (~60 s for a 5 MB model) plus the D2H fetch straight back
            import jax

            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass  # backend already initialized (e.g. library use)
        from lichtfeld_studio_tpu.render.headless import splats_from_ply

        named = []
        for p_ in paths:
            try:
                named.append((Path(p_).stem, splats_from_ply(p_)))
            except Exception as e:  # corrupt / non-splat file: clean
                # diagnostic, not a traceback (reference loader facade error
                # propagation, src/loader/loader.cpp:19-80 std::expected)
                print(
                    f"error: could not load splat file {p_}: {e}",
                    file=sys.stderr,
                )
                return 2
        if str(args.render_output).endswith(".html"):
            from lichtfeld_studio_tpu.render.web_viewer import export_html

            out = export_html(
                named if len(named) > 1 else named[0][1],
                args.render_output,
                max_points=args.viewer_max_points,
            )
            print(f"interactive viewer written to {out} — open in any browser")
        else:
            from lichtfeld_studio_tpu.render.headless import (
                concat_splats,
                render_ply_orbit,
            )

            splats = named[0][1] if len(named) == 1 else concat_splats(
                [s for _, s in named]
            )
            render_ply_orbit(
                splats, args.render_output,
                width=args.render_size[0], height=args.render_size[1],
            )
        return 0

    if not params.dataset.data_path:
        if args.live_viewer is not None:
            # studio lobby (reference run_gui_app with no data,
            # application.cpp:56-138): open datasets/models, configure +
            # start runs, crop/transform/save — all from the browser
            from lichtfeld_studio_tpu.render.live_server import LiveTrainingServer
            from lichtfeld_studio_tpu.render.studio import StudioSession

            session = StudioSession(out_dir=args.output_path)
            server = LiveTrainingServer(session, port=args.live_viewer).start()
            print("studio session — open a dataset or model from the browser",
                  flush=True)
            try:
                while True:
                    import time as _time

                    _time.sleep(3600)
            except KeyboardInterrupt:
                pass
            finally:
                server.stop()
            return 0
        print("error: --data-path required for training", file=sys.stderr)
        return 2

    from lichtfeld_studio_tpu.train.trainer import Trainer

    trainer = Trainer.setup(params)

    def progress(it, loss, n):
        print(f"iter {it:>6}  loss {loss:.5f}  gaussians {n}", flush=True)

    trainer.progress_callback = progress

    server = None
    if args.live_viewer is not None:
        from lichtfeld_studio_tpu.render.live_server import LiveTrainingServer

        # mark training active BEFORE the server accepts requests: a render
        # arriving before train() flips the flag would self-claim on the
        # HTTP thread and race the first dispatch's buffer donation
        trainer.training_active = True
        server = LiveTrainingServer(trainer, port=args.live_viewer).start()
        trainer.control = server.control
    try:
        stats = trainer.train()
    finally:
        if server is not None:
            server.stop()
    print(
        f"done: {stats['elapsed_s']:.1f}s ({stats['iters_per_s']:.2f} it/s), "
        f"{stats['num_gaussians']} gaussians, final loss {stats['final_loss']:.5f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
