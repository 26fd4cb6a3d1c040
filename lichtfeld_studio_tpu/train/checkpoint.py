"""Training-state checkpoint/resume.

The reference has NO training-state snapshots — checkpoints are model
exports only (PLY/SOG at save_steps; optimizer state and iteration counter
are lost, SURVEY §5.4; warm start via --init-ply re-initializes Adam).
Here the full TrainState pytree (params, Adam moments + per-group LR,
RNG key, iteration, ADC stats, aux params, ADMM duals) round-trips through
Orbax, so training resumes bit-exactly — a genuine capability improvement.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import numpy as np

from lichtfeld_studio_tpu.train.state import TrainState


def save_checkpoint(state: TrainState, path: str | Path) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    # static metadata travels alongside (meta fields are not pytree leaves)
    meta = {
        "max_sh_degree": state.splats.max_sh_degree,
        "scene_scale": state.splats.scene_scale,
    }
    ckptr.save(path, {"state": state, "meta": meta}, force=True)


def peek_capacity(path: str | Path) -> int | None:
    """Gaussian capacity stored in a snapshot (leaf shape of splats.means)
    without restoring it — lets --resume adopt the grown capacity bucket
    before building the restore template."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    try:
        meta = ckptr.metadata(Path(path).absolute())
        return int(meta["state"]["splats"]["means"].shape[0])
    except Exception:
        return None


def load_checkpoint(path: str | Path, template: TrainState) -> TrainState:
    """Restore into the shapes/dtypes of `template` (build it with the same
    configuration used at save time)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item={"state": template, "meta": {
        "max_sh_degree": template.splats.max_sh_degree,
        "scene_scale": template.splats.scene_scale,
    }})
    state = restored["state"]
    meta = restored["meta"]
    splats = dataclasses.replace(
        state.splats,
        max_sh_degree=int(meta["max_sh_degree"]),
        scene_scale=float(meta["scene_scale"]),
    )
    return dataclasses.replace(state, splats=splats)
