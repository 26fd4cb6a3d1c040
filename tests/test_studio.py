"""Studio session: the browser-driven application lifecycle — open a
dataset/model, configure + start training, crop/transform the model, save —
the headless parity test for the reference GUI flow (application.cpp:56-138
run_gui_app, DataLoadingService, TrainerManager::start_training
training_manager.cpp:121-165, and the crop/translation tools)."""

import json
import time
import urllib.request

import numpy as np
import pytest

from lichtfeld_studio_tpu.io.ply import write_ply
from lichtfeld_studio_tpu.render.live_server import LiveTrainingServer
from lichtfeld_studio_tpu.render.studio import StudioSession
from tests.scene_utils import make_random_splats


def _get(port, path, timeout=30):
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=timeout
        ) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _post(port, path, body: dict, timeout=60):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST",
        data=json.dumps(body).encode(),
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_studio_open_ply_crop_save(rng, tmp_path):
    splats = make_random_splats(rng, n=64, capacity=64, spread=1.0)
    write_ply(splats.to_point_cloud(), tmp_path / "model.ply")

    session = StudioSession(out_dir=tmp_path / "out")
    server = LiveTrainingServer(session, port=0).start()
    try:
        code, body = _get(server.port, "/session.json")
        assert code == 200 and json.loads(body)["mode"] == "lobby"

        # verbs reject cleanly before a model exists
        code, res = _post(server.port, "/crop", {"min": [0, 0, 0], "max": [1, 1, 1]})
        assert code == 409 and "error" in res
        code, res = _post(server.port, "/open", {"path": str(tmp_path / "nope.ply")})
        assert code == 409

        code, res = _post(server.port, "/open", {"path": str(tmp_path / "model.ply")})
        assert code == 200 and res["mode"] == "viewing"
        assert res["num_gaussians"] == 64

        # the static model renders through the standard endpoint
        code, body = _get(server.port, "/render.png?w=48&h=32", timeout=600)
        assert code == 200

        # crop to the +x half-space: fewer gaussians survive, none outside
        code, res = _post(
            server.port, "/crop", {"min": [0, -2, -2], "max": [2, 2, 2]}
        )
        assert code == 200 and 0 < res["kept"] < 64
        kept = res["kept"]
        means = np.asarray(session.splats.means[: int(session.splats.n_active)])
        assert means.shape[0] == kept and (means[:, 0] >= 0).all()

        # SE(3) edit shifts the means
        code, res = _post(server.port, "/transform", {"translate": [5.0, 0, 0]})
        assert code == 200
        moved = np.asarray(session.splats.means[:kept])
        np.testing.assert_allclose(moved[:, 0], means[:, 0] + 5.0, atol=1e-5)

        code, res = _post(server.port, "/saveply", {"name": "edited"})
        assert code == 200
        from lichtfeld_studio_tpu.render.headless import splats_from_ply

        reloaded = splats_from_ply(res["path"])
        assert int(reloaded.n_active) == kept
    finally:
        server.stop()


@pytest.mark.slow
def test_studio_dataset_to_train_to_crop(rng, tmp_path):
    """The VERDICT-6 journey: dataset -> train -> watch -> crop -> save in
    one browser session without restarting the CLI."""
    from tests.test_trainer_e2e import _make_dataset

    _make_dataset(rng, tmp_path / "scene", n_views=4)
    session = StudioSession(out_dir=tmp_path / "out")
    server = LiveTrainingServer(session, port=0).start()
    try:
        code, res = _post(server.port, "/open", {"path": str(tmp_path / "scene")})
        assert code == 200 and res["mode"] == "staged" and res["num_cameras"] == 4

        # training cannot start twice; edits are rejected mid-run
        code, res = _post(server.port, "/train", {"argv": [
            "-i", "8", "--max-cap", "2048", "--instance-cap", "8192",
            "--start-refine", "100000", "--sh-degree", "1",
            "--random", "--init-num-pts", "128", "--dispatch-steps", "2",
        ]})
        assert code == 200 and res["mode"] == "training"
        code, res = _post(server.port, "/train", {"argv": []})
        assert code == 409

        assert session.wait(timeout=900), "training did not finish"
        assert session.train_error is None
        assert session.mode == "done"
        code, body = _get(server.port, "/state.json")
        assert json.loads(body)["status"] == "done"

        # the finished model is adopted for viewing/editing
        n_before = int(session.splats.n_active)
        assert n_before == 128
        code, res = _post(
            server.port, "/crop", {"min": [-0.5, -2, -2], "max": [2, 2, 2]}
        )
        assert code == 200 and res["kept"] + res["removed"] == n_before

        code, res = _post(server.port, "/saveply", {"name": "final_cropped"})
        assert code == 200
        import os

        assert os.path.exists(res["path"])
    finally:
        session.control and session.control.request_stop()
        server.stop()
