"""Camera pose optimization.

Reference: src/training/components/poseopt.{cpp,hpp}. Three modes:
identity (none), `direct` — per-camera 9D embedding (3 translation + 6D
rotation delta), and `mlp` — per-camera embedding -> MLP(width 64, depth 2)
-> 9D delta. The delta forms a 4x4 right-multiplied onto the
world-to-camera transform. Trained with Adam lr 1e-5 (trainer.cpp:384-386).
Parameters live in a plain pytree dict so they join the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ROT6D_IDENTITY = jnp.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])


def rotation_6d_to_matrix(rot6d: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] via Gram-Schmidt (poseopt.cpp:12-21)."""
    a1, a2 = rot6d[..., :3], rot6d[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def init_pose_params(mode: str, num_cameras: int, width: int = 64, depth: int = 2, key=None) -> dict:
    """Zero-initialized pose parameters (both modes start as identity)."""
    if mode == "none":
        return {}
    if mode == "direct":
        return {"embeddings": jnp.zeros((num_cameras, 9), jnp.float32)}
    if mode == "mlp":
        if key is None:
            key = jax.random.PRNGKey(0)
        params = {"embeddings": jnp.zeros((num_cameras, width), jnp.float32)}
        for i in range(depth):
            key, sub = jax.random.split(key)
            # torch Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
            lim = 1.0 / jnp.sqrt(width)
            params[f"w{i}"] = jax.random.uniform(sub, (width, width), minval=-lim, maxval=lim)
            key, sub = jax.random.split(key)
            params[f"b{i}"] = jax.random.uniform(sub, (width,), minval=-lim, maxval=lim)
        params["w_out"] = jnp.zeros((width, 9), jnp.float32)  # zero-init last layer
        params["b_out"] = jnp.zeros((9,), jnp.float32)
        return params
    raise ValueError(f"unknown pose optimization mode {mode}")


def _delta_to_transform(delta: jnp.ndarray) -> jnp.ndarray:
    """9D delta -> 4x4 (poseopt.cpp:31-45)."""
    t = delta[:3]
    rot = rotation_6d_to_matrix(delta[3:] + ROT6D_IDENTITY)
    m = jnp.eye(4, dtype=delta.dtype)
    m = m.at[:3, :3].set(rot)
    m = m.at[:3, 3].set(t)
    return m


def apply_pose_opt(mode: str, params: dict, w2c: jnp.ndarray, uid: jnp.ndarray, depth: int = 2) -> jnp.ndarray:
    """Adjust one camera's w2c [4,4] (reference right-multiplies the delta)."""
    if mode == "none" or not params:
        return w2c
    if mode == "direct":
        delta = params["embeddings"][uid]
    else:  # mlp
        import jax

        h = params["embeddings"][uid]
        # full f32: pose deltas are sub-pixel-sensitive
        hp = jax.lax.Precision.HIGHEST
        for i in range(depth):
            h = jnp.maximum(
                jnp.matmul(h, params[f"w{i}"], precision=hp) + params[f"b{i}"], 0.0
            )
        delta = jnp.matmul(h, params["w_out"], precision=hp) + params["b_out"]
    return w2c @ _delta_to_transform(delta)
