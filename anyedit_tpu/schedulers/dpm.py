"""DPM-Solver++(2M) and PLMS samplers — the remaining samplers of the
reference's ldm runtime (ldm/models/diffusion/dpm_solver/dpm_solver.py,
PLMSSampler in ldm/models/diffusion/plms.py), as pure step functions whose
multistep history is explicit carry state so whole loops jit.

DPM-Solver++(2M): data-prediction multistep in log-SNR (λ) time — the
2nd-order method behind SD's fast 20-25-step sampling.
PLMS: pseudo linear multistep over eps (Adams-Bashforth up to 4th order)
with the DDIM update on the averaged eps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from anyedit_tpu.schedulers.common import NoiseSchedule, pred_x0, spaced_timesteps


class DPMState(NamedTuple):
    timesteps: jnp.ndarray   # (S,) descending
    alphas: jnp.ndarray      # (S+1,) sqrt(acp) incl. final level
    sigmas: jnp.ndarray      # (S+1,)
    lambdas: jnp.ndarray     # (S+1,) log(alpha/sigma)


def dpm_init(ns: NoiseSchedule, num_inference_steps: int) -> DPMState:
    ts = spaced_timesteps(ns.num_train_steps, num_inference_steps)
    acp = ns.alphas_cumprod[ts]
    step = ns.num_train_steps // num_inference_steps
    prev = jnp.maximum(ts - step, 0)
    acp_next = ns.alphas_cumprod[prev]
    acp_all = jnp.concatenate([acp, acp_next[-1:]])
    alphas = jnp.sqrt(acp_all)
    sigmas = jnp.sqrt(1.0 - acp_all)
    lambdas = jnp.log(jnp.maximum(alphas, 1e-10)) - \
        jnp.log(jnp.maximum(sigmas, 1e-10))
    return DPMState(ts, alphas, sigmas, lambdas)


class DPMCarry(NamedTuple):
    prev_x0: jnp.ndarray     # x0 prediction of the previous step
    has_prev: jnp.ndarray    # scalar bool (0./1.)


def dpm_carry_init(shape) -> DPMCarry:
    return DPMCarry(jnp.zeros(shape, jnp.float32), jnp.zeros((), jnp.float32))


def dpm_step(ns: NoiseSchedule, st: DPMState, i: jnp.ndarray,
             model_out: jnp.ndarray, sample: jnp.ndarray,
             carry: DPMCarry) -> tuple[jnp.ndarray, DPMCarry]:
    """One DPM-Solver++(2M) update at loop index i (0 = highest noise)."""
    t = st.timesteps[i]
    x = sample.astype(jnp.float32)
    x0, _ = pred_x0(ns, model_out.astype(jnp.float32), x, t)

    lam_t = st.lambdas[i]
    lam_n = st.lambdas[i + 1]
    lam_p = st.lambdas[jnp.maximum(i - 1, 0)]
    h = lam_n - lam_t
    h_prev = lam_t - lam_p
    r = h_prev / jnp.maximum(h, 1e-10)
    # 2M correction when a previous x0 exists, else 1st-order (DPM++ 1S)
    use2 = carry.has_prev * (i > 0)
    d = jnp.where(use2 > 0,
                  (1.0 + 1.0 / (2.0 * jnp.maximum(r, 1e-10))) * x0
                  - (1.0 / (2.0 * jnp.maximum(r, 1e-10))) * carry.prev_x0,
                  x0)
    sig_t, sig_n = st.sigmas[i], st.sigmas[i + 1]
    alp_n = st.alphas[i + 1]
    prev = (sig_n / jnp.maximum(sig_t, 1e-10)) * x \
        - alp_n * jnp.expm1(-h) * d
    return prev.astype(sample.dtype), DPMCarry(x0, jnp.ones((), jnp.float32))


class PLMSCarry(NamedTuple):
    eps_hist: jnp.ndarray    # (4, ...) ring of previous eps
    n_hist: jnp.ndarray      # scalar count


def plms_carry_init(shape) -> PLMSCarry:
    return PLMSCarry(jnp.zeros((4,) + tuple(shape), jnp.float32),
                     jnp.zeros((), jnp.int32))


def plms_step(ns: NoiseSchedule, st: "DPMState", i: jnp.ndarray,
              model_out: jnp.ndarray, sample: jnp.ndarray,
              carry: PLMSCarry) -> tuple[jnp.ndarray, PLMSCarry]:
    """PLMS: Adams-Bashforth average of eps history (orders 1→4 as history
    fills), then the deterministic DDIM transition (plms.py p_sample_plms)."""
    t = st.timesteps[i]
    x = sample.astype(jnp.float32)
    _, eps = pred_x0(ns, model_out.astype(jnp.float32), x, t)

    h = carry.eps_hist
    n = carry.n_hist
    e1 = h[0]
    e2 = h[1]
    e3 = h[2]
    ab2 = (3 * eps - e1) / 2
    ab3 = (23 * eps - 16 * e1 + 5 * e2) / 12
    ab4 = (55 * eps - 59 * e1 + 37 * e2 - 9 * e3) / 24
    eps_avg = jnp.where(n == 0, eps,
                        jnp.where(n == 1, ab2,
                                  jnp.where(n == 2, ab3, ab4)))

    acp_t = st.alphas[i] ** 2
    acp_n = st.alphas[i + 1] ** 2
    x0 = (x - jnp.sqrt(1 - acp_t) * eps_avg) / jnp.sqrt(acp_t)
    prev = jnp.sqrt(acp_n) * x0 + jnp.sqrt(1 - acp_n) * eps_avg
    new_hist = jnp.concatenate([eps[None], h[:3]], axis=0)
    return prev.astype(sample.dtype), PLMSCarry(new_hist, n + 1)
