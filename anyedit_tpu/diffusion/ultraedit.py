"""SD3-UltraEdit masked instruction editing + Flux pair synthesis.

Ports:
  * `ultraedit_edit` — the 3-way-CFG flow-matching editing loop of the
    vendored `StableDiffusion3InstructPix2PixPipeline`
    (attribute_tool.py:546 prepare_image_latents 3-way concat, :628+
    denoise loop with optional mask channel), on our MMDiT surface.
  * `flux_pair` — textual_change's same-seed caption-pair generation
    (textual_change_tool.py:15-58): two prompts, one seed, 4 steps.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from anyedit_tpu.schedulers.flow import FlowState, flow_init, flow_step, flow_add_noise

# v_fn(x_cat, t_cont (B,), ctx, pooled) -> velocity
VFn = Callable[..., jnp.ndarray]


def ultraedit_edit(v_fn: VFn,
                   image_latents: jnp.ndarray,
                   cond_ctx: jnp.ndarray, cond_pooled: jnp.ndarray,
                   uncond_ctx: jnp.ndarray, uncond_pooled: jnp.ndarray,
                   key: jax.Array,
                   num_steps: int = 50,
                   guidance_scale: float = 8.0,
                   image_guidance_scale: float = 1.5,
                   mask: Optional[jnp.ndarray] = None,
                   shift: float = 3.0) -> jnp.ndarray:
    """Masked SD3 instruction edit → edited latents.

    image_latents (B,h,w,C); mask (B,h,w,1), 1 = editable (None = global).
    Conditioning rows per step: [full, image-only, uncond].
    """
    b = image_latents.shape[0]
    st = flow_init(num_steps, shift=shift)
    latents = jax.random.normal(key, image_latents.shape, jnp.float32)

    ctx = jnp.concatenate([cond_ctx, uncond_ctx, uncond_ctx], axis=0)
    pooled = jnp.concatenate([cond_pooled, uncond_pooled, uncond_pooled], axis=0)
    img_cond = jnp.concatenate(
        [image_latents, image_latents, jnp.zeros_like(image_latents)], axis=0)
    mask_ch = (jnp.ones(image_latents.shape[:-1] + (1,), jnp.float32)
               if mask is None else mask)
    mask3 = jnp.concatenate([mask_ch] * 3, axis=0)
    renoise = jax.random.normal(jax.random.fold_in(key, 1),
                                image_latents.shape, jnp.float32)

    def body(i, lat):
        lat3 = jnp.concatenate([lat, lat, lat], axis=0)
        x_in = jnp.concatenate([lat3, img_cond, mask3], axis=-1)
        t = jnp.full((3 * b,), st.timesteps[i])
        v3 = v_fn(x_in, t, ctx, pooled)
        v_full, v_img, v_unc = jnp.split(v3, 3, axis=0)
        v = v_unc + guidance_scale * (v_full - v_img) \
            + image_guidance_scale * (v_img - v_unc)
        lat = flow_step(st, i, v, lat)
        if mask is not None:
            ren = jnp.where(i + 1 < num_steps,
                            flow_add_noise(st, jnp.minimum(i + 1, num_steps - 1),
                                           image_latents, renoise),
                            image_latents)
            lat = mask * lat + (1.0 - mask) * ren
        return lat

    return jax.lax.fori_loop(0, num_steps, body, latents)


def flux_sample(v_fn: VFn, shape: tuple[int, ...],
                ctx: jnp.ndarray, pooled: jnp.ndarray, key: jax.Array,
                num_steps: int = 4, shift: float = 1.0,
                guidance: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Plain rectified-flow sampling (flux-schnell: 4 steps, no CFG)."""
    st = flow_init(num_steps, shift=shift)
    lat = jax.random.normal(key, shape, jnp.float32)
    b = shape[0]

    def body(i, lat):
        t = jnp.full((b,), st.timesteps[i])
        v = v_fn(lat, t, ctx, pooled) if guidance is None else \
            v_fn(lat, t, ctx, pooled, guidance)
        return flow_step(st, i, v, lat)

    return jax.lax.fori_loop(0, num_steps, body, lat)


def flux_pair(v_fn: VFn, shape: tuple[int, ...],
              ctx_a: jnp.ndarray, pooled_a: jnp.ndarray,
              ctx_b: jnp.ndarray, pooled_b: jnp.ndarray,
              seed: int, num_steps: int = 4) -> tuple[jnp.ndarray, jnp.ndarray]:
    """textual_change: SAME seed for both captions so only the text differs."""
    key = jax.random.key(seed)
    a = flux_sample(v_fn, shape, ctx_a, pooled_a, key, num_steps)
    b = flux_sample(v_fn, shape, ctx_b, pooled_b, key, num_steps)
    return a, b
