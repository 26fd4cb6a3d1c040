"""Sinusoidal background modulation (anti-floater trick).

Reference: trainer.cpp:474-577 (inv_weight_piecewise + sine_background_for
_step + background_for_step). Phase-shifted RGB sines with coprime periods
(37/41/43), jittered, mixed into the base background with a piecewise
schedule: full for the first quarter of training, linear to 0.5 by the half,
linear to 0 by three quarters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 6.283185307179586


def inv_weight_piecewise(step: jax.Array, max_steps: int) -> jax.Array:
    phase = jnp.clip(step.astype(jnp.float32) / max(max_steps, 1), 0.0, 1.0)
    w_mid = 0.5 + (0.0 - 0.5) * (phase - 0.5) / 0.25
    w_hi = 1.0 + (0.5 - 1.0) * (phase - 0.25) / 0.25
    return jnp.where(phase < 0.25, 1.0, jnp.where(phase < 0.5, w_hi, w_mid))


def sine_background(step: jax.Array, key: jax.Array, jitter_amp: float = 0.03) -> jax.Array:
    eps = 1e-4
    pr, pg, pb = 37, 41, 43
    phase_r = TWO_PI * (step % pr).astype(jnp.float32) / pr
    phase_g = TWO_PI * (step % pg).astype(jnp.float32) / pg
    phase_b = TWO_PI * (step % pb).astype(jnp.float32) / pb
    bg = 0.5 * (
        1.0
        + jnp.stack(
            [
                jnp.sin(phase_r),
                jnp.sin(phase_g + TWO_PI / 3.0),
                jnp.sin(phase_b + 2.0 * TWO_PI / 3.0),
            ]
        )
    )
    jitter = (jax.random.uniform(key, (3,)) - 0.5) * (2.0 * jitter_amp)
    return jnp.clip(bg + jitter, eps, 1.0 - eps)


def background_for_step(
    base_bg: jax.Array, step: jax.Array, key: jax.Array, max_steps: int, enabled: bool
) -> jax.Array:
    if not enabled:
        return base_bg
    w = inv_weight_piecewise(step, max_steps)
    sine = sine_background(step, key)
    return (1.0 - w) * base_bg + w * sine
