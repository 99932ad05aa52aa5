"""Noise-schedule math shared by every sampler.

Pure-array re-derivation of the DDPM/DDIM machinery the reference gets from
`ldm/models/diffusion/ddpm.py:46-520` and diffusers schedulers — as data +
pure functions so whole denoise loops compile under `lax.fori_loop`/`scan`.

All tensors are kept in float32 here (schedule math is tiny); model inputs /
outputs are bfloat16 and cast at the boundary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# SD-family defaults (ldm configs: linear_start 0.00085, linear_end 0.012).
DEFAULT_BETA_START = 0.00085
DEFAULT_BETA_END = 0.012
DEFAULT_TRAIN_STEPS = 1000


class NoiseSchedule(NamedTuple):
    """Static per-model arrays over the full training-time discretization."""

    betas: jnp.ndarray            # (T,)
    alphas_cumprod: jnp.ndarray   # (T,)
    num_train_steps: int
    prediction_type: str = "epsilon"   # epsilon | v_prediction | sample


def make_noise_schedule(num_train_steps: int = DEFAULT_TRAIN_STEPS,
                        beta_start: float = DEFAULT_BETA_START,
                        beta_end: float = DEFAULT_BETA_END,
                        beta_schedule: str = "scaled_linear",
                        prediction_type: str = "epsilon") -> NoiseSchedule:
    if beta_schedule == "scaled_linear":
        betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                             num_train_steps, dtype=jnp.float32) ** 2
    elif beta_schedule == "linear":
        betas = jnp.linspace(beta_start, beta_end, num_train_steps, dtype=jnp.float32)
    elif beta_schedule == "squaredcos_cap_v2":
        t = jnp.arange(num_train_steps + 1, dtype=jnp.float32) / num_train_steps
        f = jnp.cos((t + 0.008) / 1.008 * jnp.pi / 2) ** 2
        betas = jnp.clip(1.0 - f[1:] / f[:-1], 0.0, 0.999)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule!r}")
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    return NoiseSchedule(betas, alphas_cumprod, num_train_steps, prediction_type)


def spaced_timesteps(num_train_steps: int, num_inference_steps: int,
                     style: str = "leading",
                     steps_offset: int = 1) -> jnp.ndarray:
    """Descending int32 timesteps for the sampling loop.

    "leading" matches diffusers' default (and the reference's DDIM loops):
    t_i = i * (T // S) + steps_offset, returned high→low. The SD/IP2P
    DDIMScheduler configs set steps_offset=1, so the 50-step grid is
    1, 21, ..., 981 — not 0, 20, ..., 980.
    """
    if style == "leading":
        step = num_train_steps // num_inference_steps
        ts = jnp.arange(num_inference_steps, dtype=jnp.int32) * step + steps_offset
        ts = jnp.minimum(ts, num_train_steps - 1)
    elif style == "trailing":
        ts = jnp.round(jnp.arange(num_train_steps, 0,
                                  -num_train_steps / num_inference_steps)).astype(jnp.int32) - 1
        ts = ts[::-1]
    else:
        raise ValueError(style)
    return ts[::-1]  # descending


def add_noise(ns: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray,
              t: jnp.ndarray) -> jnp.ndarray:
    """Forward process q(x_t | x_0) — the reference's `q_x` (tool.py:683-689)."""
    acp = ns.alphas_cumprod[t].astype(x0.dtype)
    acp = acp.reshape((-1,) + (1,) * (x0.ndim - 1)) if acp.ndim else acp
    return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise


def velocity_target(ns: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray,
                    t: jnp.ndarray) -> jnp.ndarray:
    acp = ns.alphas_cumprod[t].astype(x0.dtype)
    acp = acp.reshape((-1,) + (1,) * (x0.ndim - 1)) if acp.ndim else acp
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * x0


def pred_x0(ns: NoiseSchedule, model_out: jnp.ndarray, sample: jnp.ndarray,
            t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convert a model output into (x0_hat, eps_hat) per prediction_type.

    `t` may be a scalar (sampler loops) or per-sample (B,) (training /
    distillation draws a different level per record)."""
    acp = ns.alphas_cumprod[t].astype(sample.dtype)
    acp = acp.reshape((-1,) + (1,) * (sample.ndim - 1)) if acp.ndim else acp
    sqrt_acp = jnp.sqrt(acp)
    sqrt_1macp = jnp.sqrt(1.0 - acp)
    if ns.prediction_type == "epsilon":
        eps = model_out
        x0 = (sample - sqrt_1macp * eps) / sqrt_acp
    elif ns.prediction_type == "v_prediction":
        x0 = sqrt_acp * sample - sqrt_1macp * model_out
        eps = sqrt_acp * model_out + sqrt_1macp * sample
    elif ns.prediction_type == "sample":
        x0 = model_out
        eps = (sample - sqrt_acp * x0) / sqrt_1macp
    else:
        raise ValueError(ns.prediction_type)
    return x0, eps
