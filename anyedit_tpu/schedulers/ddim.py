"""DDIM sampler as pure step functions (incl. inversion).

Re-derivation of the reference's `DDIMSampler.p_sample_ddim`
(ldm/models/diffusion/ddim.py:181) and the `ddim_inversion` used by the
WYS-IP2P editor (tools/global_tool.py:331) — designed so the whole sampling
loop lives inside one `jax.lax.fori_loop` under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from anyedit_tpu.schedulers.common import NoiseSchedule, pred_x0, spaced_timesteps


class DDIMState(NamedTuple):
    timesteps: jnp.ndarray       # (S,) descending
    alphas_cumprod: jnp.ndarray  # (S,) acp at each timestep
    alphas_cumprod_prev: jnp.ndarray  # (S,) acp at the next (lower) timestep
    eta: float


def ddim_init(ns: NoiseSchedule, num_inference_steps: int, eta: float = 0.0,
              style: str = "leading") -> DDIMState:
    ts = spaced_timesteps(ns.num_train_steps, num_inference_steps, style)
    acp = ns.alphas_cumprod[ts]
    step = ns.num_train_steps // num_inference_steps
    prev_ts = ts - step
    # Below t=0 the SD convention (ldm ddim_alphas_prev[0], diffusers
    # set_alpha_to_one=False) is alphas_cumprod[0], not 1.0.
    acp_prev = jnp.where(prev_ts >= 0, ns.alphas_cumprod[jnp.maximum(prev_ts, 0)],
                         ns.alphas_cumprod[0])
    return DDIMState(ts, acp, acp_prev, eta)


def ddim_step(ns: NoiseSchedule, st: DDIMState, i: jnp.ndarray,
              model_out: jnp.ndarray, sample: jnp.ndarray,
              key: jax.Array | None = None) -> jnp.ndarray:
    """One x_t → x_{t-1} update at loop index i (0 = highest noise)."""
    t = st.timesteps[i]
    x0, eps = pred_x0(ns, model_out.astype(jnp.float32), sample.astype(jnp.float32), t)
    acp_prev = st.alphas_cumprod_prev[i]
    acp_t = st.alphas_cumprod[i]
    sigma = st.eta * jnp.sqrt((1 - acp_prev) / (1 - acp_t)) \
        * jnp.sqrt(1 - acp_t / acp_prev)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma ** 2, 0.0)) * eps
    prev = jnp.sqrt(acp_prev) * x0 + dir_xt
    if st.eta > 0:
        assert key is not None, "eta>0 DDIM needs a PRNG key"
        prev = prev + sigma * jax.random.normal(key, sample.shape, jnp.float32)
    return prev.astype(sample.dtype)


def ddim_inversion_step(ns: NoiseSchedule, st: DDIMState, i: jnp.ndarray,
                        model_out: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
    """One x_{t-1} → x_t inversion update (deterministic, eta must be 0).

    Walk the same spaced schedule upward: at loop index i we move from the
    (lower-noise) level `alphas_cumprod_prev[i]` to `alphas_cumprod[i]`.
    """
    t = st.timesteps[i]
    # sample is at noise level acp_prev; reinterpret via prediction type at t
    acp_prev = st.alphas_cumprod_prev[i]
    acp_t = st.alphas_cumprod[i]
    x = sample.astype(jnp.float32)
    eps = model_out.astype(jnp.float32)
    del t
    x0 = (x - jnp.sqrt(1.0 - acp_prev) * eps) / jnp.sqrt(acp_prev)
    nxt = jnp.sqrt(acp_t) * x0 + jnp.sqrt(1.0 - acp_t) * eps
    return nxt.astype(sample.dtype)
