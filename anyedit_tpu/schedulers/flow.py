"""Rectified-flow / flow-matching Euler sampler (SD3 & Flux family).

The SD3 UltraEdit pipeline (reference attribute_tool.py:83+) and Flux-schnell
(textual_change_tool.py) sample with FlowMatchEulerDiscrete semantics:
x_t = (1-σ_t)·x0 + σ_t·ε, model predicts velocity v = ε - x0, and an Euler
step is x_{t+1} = x_t + (σ_next - σ_t)·v. Includes the resolution-dependent
timestep `shift` used by both model families.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FlowState(NamedTuple):
    timesteps: jnp.ndarray  # (S,) in training-time units (σ·1000)
    sigmas: jnp.ndarray     # (S+1,) descending 1→0


def flow_init(num_inference_steps: int, shift: float = 3.0,
              use_dynamic_shifting: bool = False, mu: float | None = None,
              num_train_steps: int = 1000) -> FlowState:
    sigmas = jnp.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps,
                          dtype=jnp.float32)
    if use_dynamic_shifting and mu is not None:
        sigmas = jnp.exp(mu) / (jnp.exp(mu) + (1.0 / sigmas - 1.0))
    else:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    timesteps = (sigmas * num_train_steps).astype(jnp.float32)
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,), jnp.float32)])
    return FlowState(timesteps, sigmas)


def flow_step(st: FlowState, i: jnp.ndarray, model_out: jnp.ndarray,
              sample: jnp.ndarray) -> jnp.ndarray:
    x = sample.astype(jnp.float32)
    v = model_out.astype(jnp.float32)
    dx = st.sigmas[i + 1] - st.sigmas[i]
    return (x + dx * v).astype(sample.dtype)


def flow_add_noise(st: FlowState, i: jnp.ndarray, x0: jnp.ndarray,
                   noise: jnp.ndarray) -> jnp.ndarray:
    s = st.sigmas[i]
    return (1.0 - s) * x0 + s * noise


def flux_mu(image_seq_len: int, base_seq_len: int = 256, max_seq_len: int = 4096,
            base_shift: float = 0.5, max_shift: float = 1.15) -> float:
    """Resolution-dependent dynamic-shift parameter (Flux convention)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    return image_seq_len * m + (base_shift - m * base_seq_len)
