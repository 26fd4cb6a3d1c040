"""Every parsed CLI flag must change behavior (VERDICT r1: a flag that
parses and does nothing is worse than no flag). Covers --gut,
--antialiasing, --render-mode, bilateral grid dims, --lpips-weights,
--resume / --save-state-every, and the .lfs project registration."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.cli import parse_args_and_params
from lichtfeld_studio_tpu.ops.rasterize import apply_render_mode, rasterize
from lichtfeld_studio_tpu.train.trainer import Trainer
from tests.scene_utils import make_camera, make_random_splats
from tests.test_trainer_e2e import _make_dataset


def _setup(tmp_path, rng, *extra):
    _make_dataset(rng, tmp_path / "scene")
    params = parse_args_and_params([
        "-d", str(tmp_path / "scene"),
        "-o", str(tmp_path / "out"),
        "--headless", "--iterations", "4",
        "--max-cap", "4096", "--instance-cap", "16384",
        "--sh-degree", "1",
        *extra,
    ])
    return Trainer.setup(params)


def test_gut_forces_ut_projection(tmp_path, rng):
    t = _setup(tmp_path, rng)
    assert t.cfg.projection == "auto"
    t2 = _setup(tmp_path / "b", rng, "--gut")
    assert t2.cfg.projection == "ut"


def test_antialiasing_changes_opacity(rng):
    """Mip-Splatting compensation scales opacity by the det ratio
    (reference rasterizer.cpp:52,181)."""
    splats = make_random_splats(rng, n=32)
    cam = make_camera().device_params()
    out_plain = rasterize(splats, cam, jnp.zeros(3), mode="tiles",
                          instance_cap=4096, k_max=64)
    out_aa = rasterize(splats, cam, jnp.zeros(3), mode="tiles",
                       instance_cap=4096, k_max=64, antialiasing=True)
    diff = float(jnp.max(jnp.abs(out_plain.image - out_aa.image)))
    assert diff > 1e-4, "antialiasing had no effect on the render"
    # compensation can only dim (det ratio <= 1) => alpha never increases
    assert float(jnp.max(out_aa.alpha - out_plain.alpha)) <= 1e-6


def test_antialiasing_flag_reaches_cfg(tmp_path, rng):
    t = _setup(tmp_path, rng, "--antialiasing")
    assert t.cfg.antialiasing is True
    assert t.evaluator is None or t.evaluator.antialiasing is True


def test_render_modes(rng):
    """apply_render_mode output shapes/semantics (rasterizer.cpp:364-394)."""
    splats = make_random_splats(rng, n=32)
    cam = make_camera().device_params()
    out = rasterize(splats, cam, jnp.zeros(3), mode="tiles",
                    instance_cap=4096, k_max=64, with_depth=True)
    h, w = out.image.shape[:2]
    assert apply_render_mode(out, "RGB").shape == (h, w, 3)
    assert apply_render_mode(out, "D").shape == (h, w, 1)
    assert apply_render_mode(out, "ED").shape == (h, w, 1)
    assert apply_render_mode(out, "RGB_D").shape == (h, w, 4)
    assert apply_render_mode(out, "RGB_ED").shape == (h, w, 4)
    d = apply_render_mode(out, "D")[..., 0]
    ed = apply_render_mode(out, "ED")[..., 0]
    mask = out.alpha > 0.3
    # expected depth = accumulated / alpha >= accumulated where alpha <= 1
    assert float(jnp.min(jnp.where(mask, ed - d, 0.0))) >= -1e-4


def test_render_mode_reaches_evaluator(tmp_path, rng):
    t = _setup(tmp_path, rng, "--eval", "--test-every", "3",
               "--render-mode", "RGB_D")
    assert t.evaluator is not None and t.evaluator.render_mode == "RGB_D"


def test_sh_degree_interval_flag(tmp_path, rng):
    """--sh-degree-interval reaches the step schedule (argument_parser.cpp
    sh-degree-interval): SH degree steps at the configured cadence."""
    from lichtfeld_studio_tpu.train.state import step_flags

    t = _setup(tmp_path, rng, "--sh-degree-interval", "7")
    assert t.cfg.mcmc.sh_degree_interval == 7
    assert step_flags(t.cfg, 7).sh_step and not step_flags(t.cfg, 6).sh_step


def test_save_depth_flag_dumps_depth(tmp_path, rng):
    """--save-depth forces eval depth-colormap dumps even in RGB mode
    (reference metrics.cpp:454-480)."""
    t = _setup(tmp_path, rng, "--eval", "--test-every", "3",
               "--eval-steps", "2", "--save-depth")
    assert t.evaluator is not None and t.evaluator.save_depth is True
    t.evaluator.evaluate(t.state.splats, 2)
    dumps = list((tmp_path / "out" / "eval_step_2").glob("*_depth.png"))
    assert dumps, "no depth dumps written"
    # without the flag, RGB mode writes no depth images
    t2 = _setup(tmp_path / "b", rng, "--eval", "--test-every", "3",
                "--eval-steps", "2")
    t2.evaluator.evaluate(t2.state.splats, 2)
    assert not list((tmp_path / "b" / "out" / "eval_step_2").glob("*_depth.png"))


def test_bilateral_dims_reach_grids(tmp_path, rng):
    t = _setup(tmp_path, rng, "--bilateral-grid",
               "--bilateral-grid-x", "4", "--bilateral-grid-y", "6",
               "--bilateral-grid-w", "2")
    g = t.state.aux_params["bilateral"]
    # [N, 12, L=W, H=Y, W=X]
    assert g.shape[1:] == (12, 2, 6, 4), g.shape


def test_lpips_weights_fixture(tmp_path, rng):
    """metrics wiring with a tiny random-weights npz (real VGG weights are
    not shippable in this environment; the loader/arch path is what's
    under test)."""
    from lichtfeld_studio_tpu.ops.lpips import _SLICES, LPIPS

    data = {}
    in_ch = 3
    for si, (out_ch, idxs) in enumerate(_SLICES):
        for idx in idxs:
            data[f"net.slice{si+1}.{idx}.weight"] = rng.normal(
                0, 0.1, (out_ch, in_ch, 3, 3)
            ).astype(np.float32)
            data[f"net.slice{si+1}.{idx}.bias"] = np.zeros(out_ch, np.float32)
            in_ch = out_ch
    for i, (out_ch, _) in enumerate(_SLICES):
        data[f"lin{i}.model.1.weight"] = np.abs(
            rng.normal(0, 1, (1, out_ch, 1, 1))
        ).astype(np.float32)
    path = tmp_path / "lpips_rand.npz"
    np.savez(path, **data)

    net = LPIPS.from_npz(str(path))
    a = jnp.asarray(rng.uniform(0, 1, (32, 40, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (32, 40, 3)).astype(np.float32))
    assert float(net(a, a)) < 1e-6
    assert float(net(a, b)) > 0.0


def test_lpips_weights_reach_evaluator(tmp_path, rng):
    from lichtfeld_studio_tpu.ops.lpips import _SLICES

    data = {}
    in_ch = 3
    for si, (out_ch, idxs) in enumerate(_SLICES):
        for idx in idxs:
            data[f"net.slice{si+1}.{idx}.weight"] = np.zeros(
                (out_ch, in_ch, 3, 3), np.float32
            )
            data[f"net.slice{si+1}.{idx}.bias"] = np.zeros(out_ch, np.float32)
            in_ch = out_ch
    for i, (out_ch, _) in enumerate(_SLICES):
        data[f"lin{i}.model.1.weight"] = np.zeros((1, out_ch, 1, 1), np.float32)
    path = tmp_path / "w.npz"
    np.savez(path, **data)
    t = _setup(tmp_path, rng, "--eval", "--test-every", "3",
               "--lpips-weights", str(path))
    assert t.evaluator is not None and t.evaluator._lpips is not None


def test_project_lfs_created_and_registers_plys(tmp_path, rng):
    t = _setup(tmp_path, rng, "--save-steps", "4")
    t.cfg = dataclasses.replace(t.cfg, k_max=64)
    proj_file = t.project.path
    assert proj_file.exists(), "project .lfs not created at setup"
    t.train()
    from lichtfeld_studio_tpu.core.project import Project

    p = Project.load(proj_file)
    plys = p.plys()
    assert len(plys) >= 1 and any(r.iteration == 4 for r in plys)


def test_save_state_and_resume(tmp_path, rng):
    t = _setup(tmp_path, rng, "--save-state-every", "2")
    t.cfg = dataclasses.replace(t.cfg, k_max=64)
    t.train()
    snap = tmp_path / "out" / "state_4"
    assert snap.exists(), "periodic state snapshot missing"

    # fresh trainer resumes from the snapshot: iteration + params restored
    t2 = _setup(tmp_path / "second", rng)
    t2.restore(str(snap))
    assert int(t2.state.iteration) == 4
    np.testing.assert_allclose(
        np.asarray(t2.state.splats.means), np.asarray(t.state.splats.means)
    )
    np.testing.assert_allclose(
        np.asarray(t2.state.adam.exp_avg["means"]),
        np.asarray(t.state.adam.exp_avg["means"]),
    )


def test_events_emitted_during_training(tmp_path, rng):
    from lichtfeld_studio_tpu.core.events import (
        CheckpointSaved,
        TrainingCompleted,
        TrainingProgress,
        bus,
    )

    got = {"progress": 0, "saved": 0, "done": 0}
    h1 = bus().when(TrainingProgress, lambda e: got.__setitem__("progress", got["progress"] + 1))
    h2 = bus().when(CheckpointSaved, lambda e: got.__setitem__("saved", got["saved"] + 1))
    h3 = bus().when(TrainingCompleted, lambda e: got.__setitem__("done", got["done"] + 1))
    try:
        t = _setup(tmp_path, rng)
        t.cfg = dataclasses.replace(t.cfg, k_max=64)
        t.train()
    finally:
        bus().off(TrainingProgress, h1)
        bus().off(CheckpointSaved, h2)
        bus().off(TrainingCompleted, h3)
    assert got["progress"] >= 1
    assert got["saved"] >= 1  # final save_ply
    assert got["done"] == 1


def test_viewer_cli_corrupt_splat_clean_error(tmp_path, capsys):
    """A corrupt -v file must produce a diagnostic + exit 2, not a traceback
    (reference loader facade std::expected propagation, loader.cpp:19-80)."""
    from lichtfeld_studio_tpu.cli import main

    bad = tmp_path / "bad.ply"
    bad.write_bytes(b"not a ply at all")
    rc = main(["-v", str(bad), "--render-output", str(tmp_path / "x.html")])
    assert rc == 2
    err = capsys.readouterr().err
    assert "could not load splat file" in err

    rc = main(["-v", str(tmp_path / "missing.ply"),
               "--render-output", str(tmp_path / "x.html")])
    assert rc == 2

    # header without end_header used to spin forever in read_ply (EOF
    # readline returns b"" which never matches) — must error out instead
    trunc = tmp_path / "trunc.ply"
    trunc.write_bytes(b"ply\nformat binary_little_endian 1.0\n")
    rc = main(["-v", str(trunc), "--render-output", str(tmp_path / "x.html")])
    assert rc == 2
    assert "truncated PLY header" in capsys.readouterr().err
