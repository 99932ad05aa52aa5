"""Generic CFG samplers: text2img and masked inpainting.

Covers the reference's uses of `StableDiffusionPipeline` /
`StableDiffusionInpaintPipeline` (local_pipeline_tool.py replace/background
paths) as pure loops over an `eps_fn`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from anyedit_tpu.schedulers import NoiseSchedule, add_noise, ddim_init, ddim_step

EpsFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def sample_text2img(eps_fn: EpsFn, ns: NoiseSchedule, shape: tuple[int, ...],
                    cond_text: jnp.ndarray, uncond_text: jnp.ndarray,
                    key: jax.Array, num_steps: int = 50,
                    guidance_scale: float = 7.5) -> jnp.ndarray:
    """Plain 2-way CFG DDIM sampling from pure noise → latents."""
    st = ddim_init(ns, num_steps)
    latents = jax.random.normal(key, shape, jnp.float32)
    ctx = jnp.concatenate([cond_text, uncond_text], axis=0)
    b = shape[0]

    def body(i, lat):
        t = st.timesteps[i]
        lat2 = jnp.concatenate([lat, lat], axis=0)
        eps2 = eps_fn(lat2, jnp.full((2 * b,), t), ctx)
        e_c, e_u = jnp.split(eps2, 2, axis=0)
        eps = e_u + guidance_scale * (e_c - e_u)
        return ddim_step(ns, st, i, eps, lat)

    return jax.lax.fori_loop(0, num_steps, body, latents)


def sample_inpaint(eps_fn: EpsFn, ns: NoiseSchedule,
                   image_latents: jnp.ndarray, mask_latent: jnp.ndarray,
                   cond_text: jnp.ndarray, uncond_text: jnp.ndarray,
                   key: jax.Array, num_steps: int = 50,
                   guidance_scale: float = 7.5,
                   masked_image_latents: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """9-channel SD-inpaint conditioning: [latents, mask, masked-image].

    mask_latent: (B,h,w,1), 1 = region to repaint (latent resolution).
    Per-step re-noised compositing keeps the unmasked region faithful even
    for checkpoints without the 9-channel wiring (4-channel fallback is the
    same loop with compositing only).
    """
    st = ddim_init(ns, num_steps)
    latents = jax.random.normal(key, image_latents.shape, jnp.float32)
    if masked_image_latents is None:
        masked_image_latents = image_latents * (1.0 - mask_latent)
    ctx = jnp.concatenate([cond_text, uncond_text], axis=0)
    b = image_latents.shape[0]
    renoise = jax.random.normal(jax.random.fold_in(key, 1), image_latents.shape)

    cond_ch = jnp.concatenate([mask_latent, masked_image_latents], axis=-1)
    cond_ch2 = jnp.concatenate([cond_ch, cond_ch], axis=0)

    def body(i, lat):
        t = st.timesteps[i]
        lat2 = jnp.concatenate([lat, lat], axis=0)
        eps2 = eps_fn(jnp.concatenate([lat2, cond_ch2], axis=-1),
                      jnp.full((2 * b,), t), ctx)
        e_c, e_u = jnp.split(eps2, 2, axis=0)
        eps = e_u + guidance_scale * (e_c - e_u)
        lat = ddim_step(ns, st, i, eps, lat)
        t_next = jnp.where(i + 1 < num_steps,
                           st.timesteps[jnp.minimum(i + 1, num_steps - 1)], 0)
        ren = jnp.where(i + 1 < num_steps,
                        add_noise(ns, image_latents, renoise, t_next),
                        image_latents)
        return mask_latent * lat + (1.0 - mask_latent) * ren

    return jax.lax.fori_loop(0, num_steps, body, latents)


def sample_img2img(eps_fn: EpsFn, ns: NoiseSchedule,
                   image_latents: jnp.ndarray,
                   cond_text: jnp.ndarray, uncond_text: jnp.ndarray,
                   key: jax.Array, num_steps: int = 50,
                   strength: float = 0.5,
                   guidance_scale: float = 7.5,
                   mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """SDEdit-style img2img: noise the input latents to the `strength`
    fraction of the schedule, then denoise the remaining steps with 2-way
    CFG (the implicit pipeline's SDXL img2img refine stage,
    implicit_tool.py:129-148 semantics). strength must be static under jit.

    mask: optional (B,h,w,1) latent-resolution float mask, 1 = repaint. With
    a mask + strength≈1 this is the 4-channel SDXL-inpaint loop
    (StableDiffusionXLInpaintPipeline on the base model: per-step composite
    of the denoised latents with the re-noised original outside the mask —
    implicit_tool.py:96-127 stage-2 semantics)."""
    st = ddim_init(ns, num_steps)
    n_run = max(1, min(num_steps, int(round(num_steps * strength))))
    i0 = num_steps - n_run
    noise = jax.random.normal(key, image_latents.shape, jnp.float32)
    lat = add_noise(ns, image_latents, noise, st.timesteps[i0])
    ctx = jnp.concatenate([cond_text, uncond_text], axis=0)
    b = image_latents.shape[0]
    renoise = jax.random.normal(jax.random.fold_in(key, 1),
                                image_latents.shape, jnp.float32)

    def body(i, lat):
        t = st.timesteps[i]
        lat2 = jnp.concatenate([lat, lat], axis=0)
        eps2 = eps_fn(lat2, jnp.full((2 * b,), t), ctx)
        e_c, e_u = jnp.split(eps2, 2, axis=0)
        eps = e_u + guidance_scale * (e_c - e_u)
        lat = ddim_step(ns, st, i, eps, lat)
        if mask is not None:
            t_next = jnp.where(i + 1 < num_steps,
                               st.timesteps[jnp.minimum(i + 1, num_steps - 1)],
                               0)
            ren = jnp.where(i + 1 < num_steps,
                            add_noise(ns, image_latents, renoise, t_next),
                            image_latents)
            lat = mask * lat + (1.0 - mask) * ren
        return lat

    return jax.lax.fori_loop(i0, num_steps, body, lat)
