"""Ancestral DDPM step (reference: ldm/models/diffusion/ddpm.py p_sample)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from anyedit_tpu.schedulers.common import NoiseSchedule, pred_x0


def ddpm_step(ns: NoiseSchedule, t: jnp.ndarray, model_out: jnp.ndarray,
              sample: jnp.ndarray, key: jax.Array,
              clip_x0: bool = True) -> jnp.ndarray:
    """One ancestral x_t → x_{t-1} update at (full-resolution) timestep t."""
    x = sample.astype(jnp.float32)
    x0, _ = pred_x0(ns, model_out.astype(jnp.float32), x, t)
    if clip_x0:
        x0 = jnp.clip(x0, -1.0, 1.0)
    acp_t = ns.alphas_cumprod[t]
    acp_prev = jnp.where(t > 0, ns.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
    beta_t = ns.betas[t]
    alpha_t = 1.0 - beta_t
    # posterior q(x_{t-1} | x_t, x0)
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * x0 + coef_xt * x
    var = jnp.clip(beta_t * (1.0 - acp_prev) / (1.0 - acp_t), 1e-20)
    noise = jax.random.normal(key, x.shape, jnp.float32)
    prev = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
    return prev.astype(sample.dtype)
