"""LCM consistency distillation of the IP2P editor — few-step fast mode.

The reference ships no distillation at all: its WYS-IP2P tool runs a
100-step DDIM loop per edit (adaptive_editing_pipelines/tools/
global_tool.py:76,367), and step count is the single largest factor in
the factory's edit-stage cost (docs/perf_roofline.md FLOP census scales
linearly in steps). Latent Consistency Models (LCM, arXiv:2310.04378;
LCM-LoRA, arXiv:2311.05556 — PAPERS.md) distill the *guided* diffusion
ODE into a consistency function f(x_t, t) ≈ x_0 that samples in 2-8
steps — a 6-25× step-count reduction of the highest-FLOP stage, on top
of (and orthogonal to) the bf16 roofline work and the W8A8 int8 mode.

IP2P specifics (this is guidance distillation, not plain LCM-for-SD):
the teacher folds the editor's 3-way classifier-free guidance — (text +
image), (image only), (neither); diffusion/ip2p.py — into the ODE at a
fixed operating point (s_txt, s_img), the factory's production setting
(global_tool.py scale_txt 8.0 / scale_img 0.9). The student sees only
the fully-conditional row, so at inference the few-step editor runs ONE
UNet pass per step instead of the teacher's batched three.

TPU-first design: the whole distillation update — teacher CFG solve,
student + EMA-target consistency evaluations, Huber loss, AdamW, EMA —
is one jittable `distill_step` (static shapes, per-sample timesteps
drawn inside), dp-batched and tp-shardable with the same spec as the
AnySD trainer (anysd.AnySDTrainer.shardings).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from anyedit_tpu.models.unet_sd import (
    UNetConfig, UNet2DCondition, SD15_IP2P_UNET, TINY_UNET,
)
from anyedit_tpu.schedulers import (
    NoiseSchedule, add_noise, ddim_init, make_noise_schedule, pred_x0,
)


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    unet: UNetConfig = SD15_IP2P_UNET
    # teacher ODE discretization (LCM distills on the inference-time DDIM
    # grid, not the full 1000-step training grid) and skip length k
    num_ddim_steps: int = 50
    skip: int = 1
    # folded 3-way CFG operating point (global_tool.py defaults)
    guidance_scale: float = 8.0
    image_guidance_scale: float = 0.9
    # LCM boundary-condition scalings (diffusers LCMScheduler defaults)
    sigma_data: float = 0.5
    timestep_scaling: float = 10.0
    ema_decay: float = 0.95
    huber_c: float = 0.001
    learning_rate: float = 1e-5


TINY_DISTILL = DistillConfig(
    unet=dataclasses.replace(TINY_UNET, in_channels=8),
    num_ddim_steps=8, learning_rate=1e-3)


def boundary_scalings(cfg: DistillConfig, t: jnp.ndarray):
    """c_skip(t), c_out(t) with f(x,t) = c_skip·x + c_out·x0_pred(x,t).

    At t=0: c_skip=1, c_out=0 ⇒ f(x,0)=x — the consistency boundary
    condition holds by construction (LCM §4.1 / diffusers
    LCMScheduler.get_scalings_for_boundary_condition_discrete).
    """
    ts = (t.astype(jnp.float32) * cfg.timestep_scaling)
    sd2 = cfg.sigma_data ** 2
    c_skip = sd2 / (ts ** 2 + sd2)
    c_out = ts / jnp.sqrt(ts ** 2 + sd2)
    return c_skip, c_out


def _bc(v: jnp.ndarray) -> jnp.ndarray:
    """(B,) → (B,1,1,1) for latent broadcasting."""
    return v[:, None, None, None]


class LCMDistiller:
    """Distills a frozen IP2P teacher UNet into a few-step student.

    batch layout (all latent-space, VAE-encoded upstream exactly like the
    AnySD trainer; train/data.py mixture batches are reusable as-is):
      edited_latents (B,h,w,4)  — x0, the edit target
      orig_latents   (B,h,w,4)  — the IP2P image-conditioning channels
      text_emb       (B,L,Dc)   — conditional text context
      uncond_emb     (B,L,Dc)   — empty-prompt context (teacher CFG rows)
    """

    def __init__(self, cfg: DistillConfig, ns: NoiseSchedule | None = None):
        self.cfg = cfg
        self.ns = ns or make_noise_schedule()
        # _teacher_eps combines CFG rows in eps-space and _ddim_skip inverts
        # x0 with the epsilon formula; other prediction types would need the
        # teacher output routed through pred_x0 first.
        if self.ns.prediction_type != "epsilon":
            raise ValueError(
                "LCMDistiller requires an epsilon-prediction schedule, got "
                f"{self.ns.prediction_type!r}")
        # trailing spacing: the grid starts at t = T-1 (999), matching the
        # consistency SAMPLER below — the leading grid's top point for a
        # 50-step schedule is 981, and for few-step sampling grids it
        # collapses catastrophically (4-step leading starts at t=751,
        # 1-step at t=1 where f(x,1) ≈ x by the boundary condition;
        # diffusers' LCMScheduler uses trailing for the same reason).
        self.st = ddim_init(self.ns, cfg.num_ddim_steps, style="trailing")
        self.unet = UNet2DCondition(cfg.unet)
        self.tx = optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adamw(cfg.learning_rate))

    # ---- init ------------------------------------------------------------
    def init(self, teacher_params) -> tuple[Any, Any, Any]:
        """Student starts AT the teacher (LCM §4.1); EMA target = student."""
        student = jax.tree_util.tree_map(jnp.asarray, teacher_params)
        ema = jax.tree_util.tree_map(jnp.asarray, teacher_params)
        return student, ema, self.tx.init(student)

    # ---- pieces ----------------------------------------------------------
    def _consistency(self, params, x_t, t, ctx, img_cond):
        """f_θ(x_t, t | text, image) → x0-space prediction."""
        unet_in = jnp.concatenate([x_t, img_cond], axis=-1)
        eps = self.unet.apply(params, unet_in, t, ctx).astype(jnp.float32)
        x0_hat, _ = pred_x0(self.ns, eps, x_t.astype(jnp.float32), t)
        c_skip, c_out = boundary_scalings(self.cfg, t)
        return _bc(c_skip) * x_t.astype(jnp.float32) + _bc(c_out) * x0_hat

    def _teacher_eps(self, params, x_t, t, batch):
        """3-way-CFG-folded teacher noise prediction (diffusion/ip2p.py)."""
        c = self.cfg
        img = batch["orig_latents"]
        lat3 = jnp.concatenate([x_t, x_t, x_t], axis=0)
        img3 = jnp.concatenate([img, img, jnp.zeros_like(img)], axis=0)
        ctx3 = jnp.concatenate([batch["text_emb"], batch["uncond_emb"],
                                batch["uncond_emb"]], axis=0)
        t3 = jnp.concatenate([t, t, t], axis=0)
        eps3 = self.unet.apply(params, jnp.concatenate([lat3, img3], -1),
                               t3, ctx3).astype(jnp.float32)
        e_full, e_img, e_unc = jnp.split(eps3, 3, axis=0)
        return (e_unc + c.guidance_scale * (e_full - e_img)
                + c.image_guidance_scale * (e_img - e_unc))

    def _ddim_skip(self, x_t, eps, t_hi, t_lo):
        """Deterministic DDIM jump t_hi → t_lo with per-sample timesteps."""
        acp_hi = _bc(self.ns.alphas_cumprod[t_hi])
        acp_lo = _bc(self.ns.alphas_cumprod[t_lo])
        x = x_t.astype(jnp.float32)
        x0 = (x - jnp.sqrt(1.0 - acp_hi) * eps) / jnp.sqrt(acp_hi)
        return jnp.sqrt(acp_lo) * x0 + jnp.sqrt(1.0 - acp_lo) * eps

    # ---- the distillation update ------------------------------------------
    def loss_fn(self, student_params, ema_params, teacher_params, batch, key):
        cfg = self.cfg
        b = batch["edited_latents"].shape[0]
        k_i, k_n = jax.random.split(key)

        # grid index n per sample: t_hi = grid[n], t_lo = grid[n+skip]
        grid = self.st.timesteps                      # (N,) descending
        n = jax.random.randint(k_i, (b,), 0,
                               cfg.num_ddim_steps - cfg.skip)
        # n + skip < num_ddim_steps by the randint bound, so t_lo always
        # indexes a real grid entry (set_alpha_to_one=False convention:
        # the grid never steps to t=0 / acp=1 — matches ddim_init).
        t_hi = grid[n]
        t_lo = grid[n + cfg.skip]

        noise = jax.random.normal(k_n, batch["edited_latents"].shape,
                                  jnp.float32)
        x_hi = add_noise(self.ns, batch["edited_latents"].astype(jnp.float32),
                         noise, t_hi)

        # teacher: one guided ODE step down the grid (no grad)
        eps_t = self._teacher_eps(teacher_params, x_hi, t_hi, batch)
        x_lo = self._ddim_skip(x_hi, eps_t, t_hi, t_lo)

        ctx, img = batch["text_emb"], batch["orig_latents"]
        online = self._consistency(student_params, x_hi, t_hi, ctx, img)
        target = jax.lax.stop_gradient(self._consistency(
            ema_params, x_lo, t_lo, ctx, img))

        # pseudo-Huber (LCM eq. 10): smooth near 0, L1-like in the tails
        d = online - target
        return jnp.mean(jnp.sqrt(jnp.square(d) + cfg.huber_c ** 2)
                        - cfg.huber_c)

    def distill_step(self, student_params, ema_params, opt_state,
                     teacher_params, batch, key):
        """One jittable update: grads → AdamW → EMA. Returns new
        (student, ema, opt_state, loss)."""
        loss, grads = jax.value_and_grad(self.loss_fn)(
            student_params, ema_params, teacher_params, batch, key)
        updates, opt_state = self.tx.update(grads, opt_state, student_params)
        student_params = optax.apply_updates(student_params, updates)
        d = self.cfg.ema_decay
        ema_params = jax.tree_util.tree_map(
            lambda e, s: d * e + (1.0 - d) * s, ema_params, student_params)
        return student_params, ema_params, opt_state, loss


def lcm_edit(unet_apply, params, ns: NoiseSchedule, cfg: DistillConfig,
             image_latents: jnp.ndarray, cond_text: jnp.ndarray,
             key: jax.Array, num_steps: int = 4,
             x_init: jnp.ndarray | None = None) -> jnp.ndarray:
    """Few-step consistency sampling for the distilled editor.

    One UNet pass per step (guidance is folded into the weights): predict
    x0 via the consistency function, then re-noise to the next grid level
    (LCM alg. 3 multistep sampling). Returns edited latents (B,h,w,4).
    `x_init` pins the starting latent (seed-parity evals against a
    teacher trajectory from the same x_T); default draws from `key`.
    """
    # trailing grid: pure-noise init must enter at t = T-1 (999), not the
    # leading grid's 1000/num_steps·0+1 (t=751 for 4 steps, t=1 for 1)
    st = ddim_init(ns, num_steps, style="trailing")
    b = image_latents.shape[0]
    k_init, k_loop = jax.random.split(key)
    x = (jax.random.normal(k_init, image_latents.shape, jnp.float32)
         if x_init is None else x_init.astype(jnp.float32))

    def f(x_t, t):
        unet_in = jnp.concatenate([x_t, image_latents], axis=-1)
        eps = unet_apply(params, unet_in, jnp.full((b,), t),
                         cond_text).astype(jnp.float32)
        x0_hat, _ = pred_x0(ns, eps, x_t, jnp.full((b,), t))
        c_skip, c_out = boundary_scalings(cfg, jnp.full((b,), t))
        return _bc(c_skip) * x_t + _bc(c_out) * x0_hat

    def body(i, carry):
        x_t, k = carry
        x0_pred = f(x_t, st.timesteps[i])
        k, k2 = jax.random.split(k)
        # re-noise to the next (lower) level; after the last step keep x0
        t_next = st.timesteps[jnp.minimum(i + 1, num_steps - 1)]
        noise = jax.random.normal(k2, x0_pred.shape, jnp.float32)
        x_t = jnp.where(i + 1 < num_steps,
                        add_noise(ns, x0_pred, noise, t_next), x0_pred)
        return x_t, k

    x, _ = jax.lax.fori_loop(0, num_steps, body, (x, k_loop))
    return x
