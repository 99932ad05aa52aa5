"""Euler-ancestral sampler in sigma space (k-diffusion formulation).

Equivalent surface to diffusers' EulerAncestralDiscreteScheduler, which the
reference's SDXL/inpaint pipelines use implicitly. Sigma-space: x = x0 + σ·ε,
model input is pre-scaled by 1/sqrt(σ²+1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from anyedit_tpu.schedulers.common import NoiseSchedule, spaced_timesteps


class EulerState(NamedTuple):
    timesteps: jnp.ndarray  # (S,) descending training timesteps
    sigmas: jnp.ndarray     # (S+1,) descending, last entry 0


def euler_ancestral_init(ns: NoiseSchedule, num_inference_steps: int) -> EulerState:
    ts = spaced_timesteps(ns.num_train_steps, num_inference_steps)
    acp = ns.alphas_cumprod[ts]
    sigmas = jnp.sqrt((1.0 - acp) / acp)
    return EulerState(ts, jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)]))


def euler_scale_input(st: EulerState, i: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    sigma = st.sigmas[i]
    return (sample / jnp.sqrt(sigma ** 2 + 1.0)).astype(sample.dtype)


def euler_ancestral_step(ns: NoiseSchedule, st: EulerState, i: jnp.ndarray,
                         model_out: jnp.ndarray, sample: jnp.ndarray,
                         key: jax.Array) -> jnp.ndarray:
    del ns  # epsilon-prediction assumed for the ancestral form
    x = sample.astype(jnp.float32)
    eps = model_out.astype(jnp.float32)
    sigma = st.sigmas[i]
    sigma_next = st.sigmas[i + 1]
    x0 = x - sigma * eps
    sigma_up = jnp.sqrt(jnp.clip(
        sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2) / jnp.clip(sigma ** 2, 1e-12),
        0.0))
    sigma_down = jnp.sqrt(jnp.clip(sigma_next ** 2 - sigma_up ** 2, 0.0))
    d = (x - x0) / jnp.clip(sigma, 1e-12)
    x_next = x + d * (sigma_down - sigma)
    noise = jax.random.normal(key, x.shape, jnp.float32)
    x_next = x_next + jnp.where(sigma_next > 0, sigma_up, 0.0) * noise
    return x_next.astype(sample.dtype)
