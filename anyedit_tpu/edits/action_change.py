"""action_change — MasaCtrl consistent pair synthesis.

Port of `consistent_synthesis` (action_change_tool.py:15-46): generate the
(input, output) caption pair from ONE shared start latent; the target
branch borrows the source branch's self-attention K/V from step 5 / layer
12 on (STEP=5, LAYER=12 in the reference), so identity/layout stay locked
while the action changes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from anyedit_tpu.diffusion.processors import masactrl_processor
from anyedit_tpu.schedulers import NoiseSchedule, ddim_init, ddim_step

# UNetApply: (x, t, ctx, processor, extra) -> eps
UNetApply = Callable[..., jnp.ndarray]

MASA_STEP = 5
MASA_LAYER = 12


def consistent_synthesis(unet_apply: UNetApply, ns: NoiseSchedule,
                         ctx_src: jnp.ndarray, ctx_tgt: jnp.ndarray,
                         uncond: jnp.ndarray, key: jax.Array,
                         latent_hw: int = 64, channels: int = 4,
                         num_steps: int = 50, guidance_scale: float = 7.5,
                         start_step: int = MASA_STEP,
                         start_layer: int = MASA_LAYER) -> jnp.ndarray:
    """Returns latents (2, hw, hw, C): [source_image, action_image]."""
    st = ddim_init(ns, num_steps)
    z0 = jax.random.normal(key, (1, latent_hw, latent_hw, channels), jnp.float32)
    lat = jnp.concatenate([z0, z0], axis=0)            # shared start latent
    # CFG layout [uc_src, uc_tgt, c_src, c_tgt] — odd rows are targets in
    # both halves, matching masactrl_processor's default pair map.
    ctx = jnp.concatenate([uncond, uncond, ctx_src, ctx_tgt], axis=0)
    proc = masactrl_processor(start_step, start_layer)

    def body(i, lat):
        lat4 = jnp.concatenate([lat, lat], axis=0)
        extra = {"step": i}
        eps4 = unet_apply(lat4, jnp.full((4,), st.timesteps[i]), ctx,
                          proc, extra)
        e_uc, e_c = jnp.split(eps4, 2, axis=0)
        eps = e_uc + guidance_scale * (e_c - e_uc)
        return ddim_step(ns, st, i, eps, lat)

    return jax.lax.fori_loop(0, num_steps, body, lat)


def action_change(tb, rec, image, rng):
    """Record-level pipeline (action_change_tool.py:49-127 driver): both
    sides are SYNTHESIZED from the (input, output) caption pair with the
    MasaCtrl-consistent sampler; `image` is unused."""
    import numpy as np
    from anyedit_tpu.edits.types import EditOutcome

    pair = tb.extra.get("masactrl_pair")
    if pair is None:
        return EditOutcome(False, reason="masactrl stack unavailable")
    seed = int(rng.integers(0, 2 ** 31))
    src, tgt = pair(rec.input, rec.output, seed)
    return EditOutcome(True, edited=np.asarray(tgt),
                       input_image=np.asarray(src))
