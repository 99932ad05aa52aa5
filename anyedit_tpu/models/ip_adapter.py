"""IP-Adapter — decoupled image-prompt attention, processor-native.

Capability parity with the reference's vendored
`other_modules/ip_adapter/` (IPAdapter/IPAdapterXL/IPAdapterPlus,
ip_adapter.py:66-350; decoupled cross-attn processors
attention_processor.py; perceiver `Resampler` resampler.py), re-designed
for the functional UNet:

  * image tokens come from `ImageProjection` (linear, plain IP-Adapter) or
    `Resampler` (perceiver, the Plus variants),
  * every cross-attention site gets its own (to_k_ip, to_v_ip) projections
    — held in ONE stacked module (`IPAdapterWeights`) keyed by site name,
  * `ip_adapter_processor` precomputes each site's image K/V ONCE per
    image (they don't depend on the latent), then adds
    `scale · attn(q, k_img, v_img)` to the text attention at every site —
    no UNet surgery, just a processor argument.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import AttnMeta, LayerNorm
from anyedit_tpu.ops.attention import sdpa_xla


class ImageProjection(nn.Module):
    """CLIP image embedding (B, D) → (B, num_tokens, context_dim)."""

    num_tokens: int = 4
    context_dim: int = 768

    @nn.compact
    def __call__(self, emb):
        x = nn.Dense(self.num_tokens * self.context_dim, name="proj")(
            emb.astype(jnp.float32))
        x = x.reshape(emb.shape[0], self.num_tokens, self.context_dim)
        return LayerNorm(dtype=jnp.float32, name="norm")(x)


class Resampler(nn.Module):
    """Perceiver resampler (IP-Adapter-Plus): patch tokens → N latents.

    Structural parity with the reference's resampler.py (PerceiverAttention:
    separate norms for image features and latents, fused bias-free to_kv over
    cat(x, latents), bias-free FF) so real `image_proj` checkpoints map 1:1.
    """

    num_latents: int = 16
    dim: int = 768
    depth: int = 4
    heads: int = 12
    out_dim: int = 768
    head_dim: int = 0        # 0 → dim // heads (reference default 64)

    @nn.compact
    def __call__(self, tokens):
        b = tokens.shape[0]
        hd = self.head_dim or self.dim // self.heads
        inner = hd * self.heads
        lat = self.param("latents", nn.initializers.normal(0.02),
                         (self.num_latents, self.dim), jnp.float32)
        x = jnp.broadcast_to(lat[None], (b, self.num_latents, self.dim))
        toks = nn.Dense(self.dim, name="in_proj")(tokens.astype(jnp.float32))
        nb = lambda n, d_: nn.Dense(d_, use_bias=False, name=n)
        for i in range(self.depth):
            x_n = LayerNorm(dtype=jnp.float32, name=f"norm1_{i}")(toks)
            l_n = LayerNorm(dtype=jnp.float32, name=f"norm2_{i}")(x)
            kv_in = jnp.concatenate([x_n, l_n], axis=1)
            sp = lambda t_, l: t_.reshape(b, l, self.heads, hd
                                          ).transpose(0, 2, 1, 3)
            q = sp(nb(f"q_{i}", inner)(l_n), self.num_latents)
            kv = nb(f"kv_{i}", 2 * inner)(kv_in)
            k = sp(kv[..., :inner], kv_in.shape[1])
            v = sp(kv[..., inner:], kv_in.shape[1])
            o = sdpa_xla(q, k, v).transpose(0, 2, 1, 3).reshape(
                b, self.num_latents, inner)
            x = x + nb(f"o_{i}", self.dim)(o)
            h = LayerNorm(dtype=jnp.float32, name=f"ffln_{i}")(x)
            h = nb(f"ff1_{i}", self.dim * 4)(h)
            x = x + nb(f"ff2_{i}", self.dim)(nn.gelu(h))
        x = nn.Dense(self.out_dim, name="out_proj")(x)
        return LayerNorm(dtype=jnp.float32, name="out_norm")(x)


class IPAdapterWeights(nn.Module):
    """Per-site decoupled K/V projections, one submodule per attention site."""

    site_names: tuple[str, ...]
    inner_dims: tuple[int, ...]     # q/kv inner dim per site (= heads·head_dim)
    context_dim: int = 768

    @nn.compact
    def __call__(self, image_tokens):
        """image_tokens (B, T, Dc) → {site: (k (B,T,inner), v (B,T,inner))}."""
        out = {}
        for name, inner in zip(self.site_names, self.inner_dims):
            safe = name.replace(".", "__")
            k = nn.Dense(inner, use_bias=False, name=f"{safe}_k")(
                image_tokens.astype(jnp.float32))
            v = nn.Dense(inner, use_bias=False, name=f"{safe}_v")(
                image_tokens.astype(jnp.float32))
            out[name] = (k, v)
        return out


def cross_attn_sites(unet_cfg) -> tuple[tuple[str, ...], tuple[int, ...]]:
    """Enumerate every cross-attention site name + its inner dim, matching
    the name_tag scheme in models/unet_sd.py."""
    names, dims = [], []

    def add(tag, ch):
        names.append(f"{tag}.cross")
        dims.append(unet_cfg.heads(ch) * unet_cfg.head_dim(ch))

    nlv = len(unet_cfg.block_channels)
    for lvl, ch in enumerate(unet_cfg.block_channels):
        if unet_cfg.attn_levels[lvl]:
            for i in range(unet_cfg.layers_per_block):
                for d in range(unet_cfg.depth_at(lvl)):
                    add(f"down_{lvl}.tf_{i}.tb{d}", ch)
    for d in range(unet_cfg.depth_at(nlv - 1)):
        add(f"mid.tf.tb{d}", unet_cfg.block_channels[-1])
    for lvl in reversed(range(nlv)):
        ch = unet_cfg.block_channels[lvl]
        if unet_cfg.attn_levels[lvl]:
            for i in range(unet_cfg.layers_per_block + 1):
                for d in range(unet_cfg.depth_at(lvl)):
                    add(f"up_{lvl}.tf_{i}.tb{d}", ch)
    return tuple(names), tuple(dims)


def ip_adapter_processor(site_kv: dict[str, tuple[jnp.ndarray, jnp.ndarray]],
                         scale: float = 1.0) -> Callable:
    """Build the decoupled-attention processor from precomputed per-site
    image K/V. Text attention unchanged; image attention added scaled."""

    def proc(q, k, v, meta: AttnMeta, extra):
        out = sdpa_xla(q, k, v)
        if meta.is_self or meta.name not in site_kv:
            return out
        ki, vi = site_kv[meta.name]
        b, h, _, d = q.shape
        t = ki.shape[1]
        sp = lambda x: x.reshape(b, t, h, d).transpose(0, 2, 1, 3).astype(q.dtype)
        out_img = sdpa_xla(q, sp(ki), sp(vi))
        return out + scale * out_img

    return proc
