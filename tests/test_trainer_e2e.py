"""End-to-end Trainer test: synthetic transforms.json dataset on disk ->
Trainer.setup -> short training -> PLY export + eval artifacts
(parity bar: the reference headless pipeline §3.1)."""

import dataclasses
import json

import jax.numpy as jnp
import numpy as np
import pytest

from lichtfeld_studio_tpu.cli import parse_args_and_params
from lichtfeld_studio_tpu.io.image import save_image
from lichtfeld_studio_tpu.io.ply import read_ply
from lichtfeld_studio_tpu.ops.rasterize import rasterize
from lichtfeld_studio_tpu.train.trainer import Trainer
from tests.scene_utils import make_camera, make_random_splats


def _make_dataset(rng, root, n_views=6, W=48, H=32):
    """Render a known gaussian scene from an orbit and write a Blender-style
    transforms.json dataset."""
    splats = make_random_splats(rng, n=48, spread=0.8)
    (root / "images").mkdir(parents=True)
    frames = []
    fov_x = 2.0 * np.arctan(W / (2 * 60.0))
    for i in range(n_views):
        theta = 2 * np.pi * i / n_views
        eye = 4.0 * np.array([np.sin(theta), -0.1, -np.cos(theta)])
        from lichtfeld_studio_tpu.core.camera import look_at_camera

        cam = look_at_camera(eye, np.zeros(3), np.array([0.0, -1.0, 0.0]),
                             fx=60.0, fy=60.0, width=W, height=H, uid=i)
        img = rasterize(splats, cam.device_params(), jnp.zeros(3), mode="tiles",
                        instance_cap=4096, k_max=64).image
        name = f"images/r_{i}.png"
        save_image(str(root / name), np.clip(np.asarray(img), 0, 1))
        # w2c -> c2w with the OpenGL axis flip the loader inverts
        w2c = cam.w2c.astype(np.float64)
        c2w = np.linalg.inv(w2c)
        c2w[:3, 1:3] *= -1.0
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": fov_x, "frames": frames}
    (root / "transforms.json").write_text(json.dumps(meta))
    return splats


@pytest.mark.slow
def test_trainer_end_to_end(rng, tmp_path):
    gt_splats = _make_dataset(rng, tmp_path / "scene")
    # warm start from the ground-truth splat (exercises --init-ply,
    # training_setup.cpp:50-71) with slightly perturbed means
    from lichtfeld_studio_tpu.io.ply import write_ply

    noisy = gt_splats.replace_trainable(
        {
            **gt_splats.trainable_dict(),
            "means": gt_splats.means
            + 0.01 * jnp.asarray(rng.normal(0, 1, gt_splats.means.shape).astype(np.float32)),
        }
    )
    write_ply(noisy.to_point_cloud(), tmp_path / "init.ply")

    params = parse_args_and_params([
        "-d", str(tmp_path / "scene"),
        "-o", str(tmp_path / "out"),
        "--headless", "--eval", "--test-every", "3",
        "--iterations", "30",
        "--eval-steps", "30", "--save-steps", "30",
        "--max-cap", "4096", "--instance-cap", "16384",
        "--start-refine", "10", "--stop-refine", "25", "--refine-every", "10",
        "--sh-degree", "2",
        "--init-ply", str(tmp_path / "init.ply"),
    ])
    # tiny capacity so the random-init fallback point cloud fits
    trainer = Trainer.setup(params)
    trainer.cfg = dataclasses.replace(trainer.cfg, k_max=64)
    stats = trainer.train()

    assert np.isfinite(stats["final_loss"])
    out = tmp_path / "out"
    ply = out / "splat_30.ply"
    assert ply.exists()
    pc = read_ply(ply)
    assert pc.size > 0
    assert (out / "metrics.csv").exists()
    rows = (out / "metrics.csv").read_text().strip().splitlines()
    assert len(rows) >= 2  # header + one eval
    psnr = float(rows[-1].split(",")[1])
    assert np.isfinite(psnr) and psnr > 15.0, psnr
    assert (out / "report.txt").exists()
