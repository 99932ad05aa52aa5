"""AnySD Stage-II trainer — task-routed MoE adapter fine-tune, pjit-native.

The reference's `AnySD/` package is absent from its checkout; this module
re-derives the required surface from the train.py call sites (train.py:25-28,
420-424,483-485,616-751 — see SURVEY.md §2f):
  * `UNet2DConditionAnySD` ≈ IP2P-wired SD1.5 UNet + decoupled image-prompt
    cross-attention whose image tokens come from a **task-routed MoE** of
    image-projection experts (11 experts, train.py:420),
  * task-embedding books mapping edit types → task ids per editing domain,
  * trainable params = image_proj experts + task embeddings (+ adapter
    gates); the UNet/VAE/text encoder stay frozen,
  * denoise-MSE loss with InstructPix2Pix conditioning dropout
    (train.py:652-669), AdamW, grad clip.

TPU-native design: experts live in ONE stacked (E, ...) tensor sharded over
the `ep` mesh axis; routing is a gather, so no all-to-all is needed (every
sample's expert weights are resolved by XLA collectives from the sharding).
Data parallel over `dp`; attention projections shard over `tp`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anyedit_tpu.models.layers import AttnMeta
from anyedit_tpu.models.unet_sd import UNetConfig, UNet2DCondition, SD15_IP2P_UNET, TINY_UNET
from anyedit_tpu.schedulers import NoiseSchedule, add_noise, make_noise_schedule
from anyedit_tpu.ops.attention import attention as attention_op

# Task-embedding books per editing domain (re-derived surface of
# AnySD.utils.task_embs_book / expert_name_list, train.py:28,420).
TASK_EMB_BOOKS: dict[str, tuple[str, ...]] = {
    "local": ("add", "remove", "replace", "counting", "color_alter",
              "appearance_alter", "material_alter", "action_change",
              "textual_change"),
    "global": ("background_change", "tone_transfer", "style_change"),
    "viewpoint": ("resize", "movement", "outpainting", "rotation_change"),
    "implicit": ("implicit_change", "relation"),
    "visual": ("visual_reference", "visual_bbox", "visual_depth",
               "visual_scribble", "visual_segment", "visual_sketch",
               "visual_material_transfer"),
}

EXPERT_NAMES: tuple[str, ...] = (
    "add_remove", "replace", "color", "appearance", "material", "action",
    "textual", "global", "viewpoint", "implicit", "visual",
)  # 11 experts (train.py:420)

_TYPE_TO_EXPERT = {
    "add": 0, "remove": 0, "counting": 0,
    "replace": 1,
    "color_alter": 2, "tone_transfer": 2,
    "appearance_alter": 3,
    "material_alter": 4, "visual_material_transfer": 4, "material_transfer": 4,
    "action_change": 5,
    "textual_change": 6,
    "background_change": 7, "style_change": 7,
    "resize": 8, "movement": 8, "outpainting": 8, "rotation_change": 8,
    "implicit_change": 9, "relation": 9,
    "visual_reference": 10, "visual_bbox": 10, "visual_depth": 10,
    "visual_scribble": 10, "visual_segment": 10, "visual_sketch": 10,
}


def expert_id(edit_type: str) -> int:
    return _TYPE_TO_EXPERT.get(edit_type, 7)


@dataclasses.dataclass(frozen=True)
class AnySDConfig:
    unet: UNetConfig = SD15_IP2P_UNET
    num_experts: int = 11
    image_embed_dim: int = 1024     # CLIP-H image embedding (ip-adapter conv.)
    num_image_tokens: int = 4
    task_emb_dim: int = 768
    dtype: Any = jnp.bfloat16


TINY_ANYSD = AnySDConfig(unet=TINY_UNET, num_experts=4, image_embed_dim=32,
                         num_image_tokens=2, task_emb_dim=32)


class TaskMoEAdapter(nn.Module):
    """Task-routed mixture of image-projection experts.

    Maps (image_embed (B,Di), task_id (B,)) → extra context tokens
    (B, num_image_tokens, context_dim) that are appended to the text context
    (decoupled image-prompt attention, IP-Adapter style), plus a learned
    per-task embedding token.

    Experts are a stacked (E, Di, T·Dc) tensor — shard axis 0 over `ep`.
    Hard routing = one gather per sample; no host-side dispatch.
    """

    cfg: AnySDConfig

    @nn.compact
    def __call__(self, image_embed: jnp.ndarray, task_id: jnp.ndarray):
        c = self.cfg
        dc = c.unet.context_dim
        e, di, tokens = c.num_experts, c.image_embed_dim, c.num_image_tokens
        w1 = self.param("expert_w1", nn.initializers.normal(0.02),
                        (e, di, di * 2), jnp.float32)
        w2 = self.param("expert_w2", nn.initializers.normal(0.02),
                        (e, di * 2, tokens * dc), jnp.float32)
        task_embs = self.param("task_embs", nn.initializers.normal(0.02),
                               (e, c.task_emb_dim), jnp.float32)
        ln = nn.LayerNorm(dtype=jnp.float32, name="out_ln")

        w1_b = w1[task_id]                      # (B, Di, 2Di) — gather over ep
        w2_b = w2[task_id]
        h = jax.nn.gelu(jnp.einsum("bd,bdh->bh", image_embed.astype(jnp.float32), w1_b))
        tok = jnp.einsum("bh,bht->bt", h, w2_b).reshape(-1, tokens, dc)
        tok = ln(tok)
        temb = task_embs[task_id]               # (B, Dt)
        if c.task_emb_dim != dc:
            temb = nn.Dense(dc, dtype=jnp.float32, name="task_proj")(temb)
        return jnp.concatenate([tok, temb[:, None, :]], axis=1)  # (B, T+1, Dc)


class AnySDTrainer:
    """Bundles the frozen UNet + trainable adapter into one pjit train step."""

    def __init__(self, cfg: AnySDConfig, ns: NoiseSchedule | None = None,
                 learning_rate: float = 1e-4):
        self.cfg = cfg
        self.ns = ns or make_noise_schedule()
        self.unet = UNet2DCondition(cfg.unet)
        self.adapter = TaskMoEAdapter(cfg)
        self.tx = optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adamw(learning_rate))

    # ---- init -----------------------------------------------------------
    def init(self, key: jax.Array, latent_hw: int, text_len: int = 77):
        c = self.cfg
        k1, k2 = jax.random.split(key)
        x = jnp.zeros((1, latent_hw, latent_hw, c.unet.in_channels), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, text_len + c.num_image_tokens + 1,
                         c.unet.context_dim), jnp.float32)
        unet_params = self.unet.init(k1, x, t, ctx)
        adapter_params = self.adapter.init(
            k2, jnp.zeros((1, c.image_embed_dim)), jnp.zeros((1,), jnp.int32))
        opt_state = self.tx.init(adapter_params)
        return unet_params, adapter_params, opt_state

    # ---- loss -----------------------------------------------------------
    def loss_fn(self, adapter_params, unet_params, batch, key):
        """Denoise-MSE with IP2P conditioning dropout (train.py:625-696).

        batch: edited_latents (B,h,w,4), orig_latents (B,h,w,4),
               text_emb (B,L,Dc), image_embed (B,Di), task_id (B,).
        """
        c = self.cfg
        b = batch["edited_latents"].shape[0]
        k_t, k_n, k_drop = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (b,), 0, self.ns.num_train_steps)
        noise = jax.random.normal(k_n, batch["edited_latents"].shape)
        noisy = add_noise(self.ns, batch["edited_latents"], noise, t)

        # IP2P conditioning dropout via ONE uniform draw with overlapping
        # ranges (diffusers train_instruct_pix2pix scheme): text dropped for
        # p < 2·prob, image for prob ≤ p < 3·prob ⇒ 5% text-only, 5%
        # image-only, 5% both — the fully-unconditional mode 3-way CFG needs.
        prob = 0.05
        p = jax.random.uniform(k_drop, (b,))
        drop_txt = (p < 2 * prob)[:, None, None]
        drop_img = ((p >= prob) & (p < 3 * prob))[:, None, None, None]
        text_emb = jnp.where(drop_txt, 0.0, batch["text_emb"])
        orig = jnp.where(drop_img, 0.0, batch["orig_latents"])

        img_tokens = self.adapter.apply(adapter_params, batch["image_embed"],
                                        batch["task_id"])
        ctx = jnp.concatenate([text_emb, img_tokens.astype(text_emb.dtype)], axis=1)
        unet_in = jnp.concatenate([noisy, orig], axis=-1)
        eps = self.unet.apply(unet_params, unet_in, t, ctx)
        return jnp.mean(jnp.square(eps - noise))

    def train_step(self, adapter_params, opt_state, unet_params, batch, key):
        loss, grads = jax.value_and_grad(self.loss_fn)(
            adapter_params, unet_params, batch, key)
        updates, opt_state = self.tx.update(grads, opt_state, adapter_params)
        adapter_params = optax.apply_updates(adapter_params, updates)
        return adapter_params, opt_state, loss

    # ---- shardings ------------------------------------------------------
    def shardings(self, mesh: Mesh):
        """NamedShardings: experts over ep, UNet attention over tp, rest
        replicated; batch over dp."""
        repl = NamedSharding(mesh, P())

        def adapter_spec(path, leaf):
            name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            if "expert_w1" in name or "expert_w2" in name or "task_embs" in name:
                return NamedSharding(mesh, P("ep"))
            return repl

        def unet_spec(path, leaf):
            name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            if leaf.ndim == 2 and ("to_q" in name or "to_k" in name or "to_v" in name):
                return NamedSharding(mesh, P(None, "tp"))
            if leaf.ndim == 2 and "to_out" in name:
                return NamedSharding(mesh, P("tp", None))
            return repl

        return adapter_spec, unet_spec, NamedSharding(mesh, P("dp"))


def shard_tree(tree, spec_fn):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, spec_fn(path, leaf)), tree)
