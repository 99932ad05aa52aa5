"""MM-DiT — the SD3-class diffusion transformer (UltraEdit's backbone).

Capability parity with the reference's vendored SD3 InstructPix2Pix
pipeline (`StableDiffusion3InstructPix2PixPipeline`, attribute_tool.py:83):
the transformer itself, rebuilt TPU-first. Dual-stream blocks: image and
text tokens carry separate adaptive-LayerNorm modulation and projections
but share ONE joint attention — a single big MXU matmul over the
concatenated sequence. Conditioning = sinusoidal timestep + pooled text,
injected via adaLN-Zero gates.

UltraEdit wiring: `in_channels` doubles (noisy latents ⊕ source-image
latents ⊕ optional mask channel) for the 3-way-CFG editing loop
(attribute_tool.py:546,628+); sampling is flow-matching
(schedulers/flow.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import timestep_embedding
from anyedit_tpu.ops.attention import attention as attention_op


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    in_channels: int = 16              # SD3 latent channels
    out_channels: int = 16
    patch: int = 2
    dim: int = 1536                    # SD3-medium
    depth: int = 24
    heads: int = 24
    context_dim: int = 4096            # T5-XXL hidden
    pooled_dim: int = 2048             # CLIP-L + CLIP-G pooled concat
    # learned positional grid; the runtime center-crops to the active grid
    # (diffusers PatchEmbed pos_embed_max_size=192 for SD3-medium)
    max_hw: int = 192
    # per-head RMS q/k norm: absent in SD3-medium (UltraEdit's base),
    # present in SD3.5
    qk_norm: bool = False
    dtype: Any = jnp.bfloat16
    # W8A8 int8 fast mode (ops/quant.py): block projections/FFNs + the
    # fused self-attention go int8; adaLN modulation, patch/time/pooled
    # embeds and the final head stay float (fp32 residual stream).
    quant: bool = False


SD3_MEDIUM = MMDiTConfig()
# UltraEdit editing wiring: noisy(16) + source latents(16) + mask(1)
SD3_ULTRAEDIT = dataclasses.replace(SD3_MEDIUM, in_channels=33)
SD35_MEDIUM = dataclasses.replace(SD3_MEDIUM, qk_norm=True)
TINY_MMDIT = MMDiTConfig(in_channels=4, out_channels=4, patch=2, dim=32,
                         depth=2, heads=2, context_dim=16, pooled_dim=8,
                         max_hw=8)


def modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class _RMSNormQK(nn.Module):
    """Per-head RMS norm on q/k (SD3 stabilization)."""

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (d,), jnp.float32)
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
        return (n * g).astype(x.dtype)


class MMDiTBlock(nn.Module):
    cfg: MMDiTConfig
    final_text: bool = False   # last block drops the text output stream

    @nn.compact
    def __call__(self, img, txt, cond):
        c = self.cfg
        d = c.dim
        hd = d // c.heads
        from anyedit_tpu.ops.quant import make_dense
        dense = lambda n, f: make_dense(f, quant=c.quant, dtype=c.dtype,
                                        name=n)

        def mods(name, n):
            m = nn.Dense(n * d, dtype=jnp.float32, name=name,
                         kernel_init=nn.initializers.zeros)(nn.silu(cond))
            return jnp.split(m, n, axis=-1)

        si1, sc1, g1, si2, sc2, g2 = mods("img_mod", 6)
        if self.final_text:
            # last block: context gets a plain scale/shift norm only
            # (diffusers AdaLayerNormContinuous; stored here shift-first)
            ti1, tc1 = mods("txt_mod", 2)
        else:
            ti1, tc1, tg1, ti2, tc2, tg2 = mods("txt_mod", 6)

        ln = lambda x: nn.LayerNorm(use_bias=False, use_scale=False,
                                    dtype=jnp.float32)(x.astype(jnp.float32))
        img_n = modulate(ln(img), si1, sc1).astype(c.dtype)
        txt_n = modulate(ln(txt), ti1, tc1).astype(c.dtype)

        def qkv(x, prefix):
            q = dense(f"{prefix}_q", d)(x)
            k = dense(f"{prefix}_k", d)(x)
            v = dense(f"{prefix}_v", d)(x)
            sp = lambda t: t.reshape(t.shape[0], t.shape[1], c.heads, hd
                                     ).transpose(0, 2, 1, 3)
            q, k = sp(q), sp(k)
            if c.qk_norm:
                q = _RMSNormQK(name=f"{prefix}_qn")(q)
                k = _RMSNormQK(name=f"{prefix}_kn")(k)
            return q, k, sp(v)

        qi, ki, vi = qkv(img_n, "img")
        qt, kt, vt = qkv(txt_n, "txt")
        li, lt = img.shape[1], txt.shape[1]
        q = jnp.concatenate([qt, qi], axis=2)   # text first (SD3 convention)
        k = jnp.concatenate([kt, ki], axis=2)
        v = jnp.concatenate([vt, vi], axis=2)
        o = attention_op(q, k, v, int8=c.quant)
        o = o.transpose(0, 2, 1, 3).reshape(img.shape[0], lt + li, d)
        ot, oi = o[:, :lt], o[:, lt:]

        img = img + g1[:, None, :] * dense("img_proj", d)(oi).astype(jnp.float32)
        h = modulate(ln(img), si2, sc2).astype(c.dtype)
        h = dense("img_fc1", 4 * d)(h)
        h = dense("img_fc2", d)(nn.gelu(h))
        img = img + g2[:, None, :] * h.astype(jnp.float32)

        if self.final_text:
            return img, txt
        txt = txt + tg1[:, None, :] * dense("txt_proj", d)(ot).astype(jnp.float32)
        h = modulate(ln(txt), ti2, tc2).astype(c.dtype)
        h = dense("txt_fc1", 4 * d)(h)
        h = dense("txt_fc2", d)(nn.gelu(h))
        txt = txt + tg2[:, None, :] * h.astype(jnp.float32)
        return img, txt


class MMDiT(nn.Module):
    """(latents NHWC, t (B,) in [0,1000], context (B,L,Dc), pooled (B,Dp))
    → velocity prediction NHWC."""

    cfg: MMDiTConfig = SD3_MEDIUM

    @nn.compact
    def __call__(self, x, t, context, pooled):
        c = self.cfg
        b, h, w, _ = x.shape
        p = c.patch
        gh, gw = h // p, w // p
        x = x.astype(c.dtype)

        # patchify → tokens
        img = x.reshape(b, gh, p, gw, p, x.shape[-1]).transpose(0, 1, 3, 2, 4, 5)
        img = img.reshape(b, gh * gw, p * p * x.shape[-1])
        img = nn.Dense(c.dim, dtype=c.dtype, name="patch_in")(img)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (c.max_hw, c.max_hw, c.dim), jnp.float32)
        # centered crop of the positional grid (diffusers cropped_pos_embed)
        top, left = (c.max_hw - gh) // 2, (c.max_hw - gw) // 2
        img = img + pos[top:top + gh, left:left + gw].reshape(
            1, gh * gw, c.dim).astype(c.dtype)
        img = img.astype(jnp.float32)

        txt = nn.Dense(c.dim, dtype=c.dtype, name="ctx_in")(
            context.astype(c.dtype)).astype(jnp.float32)

        temb = timestep_embedding(t, 256)
        temb = nn.Dense(c.dim, dtype=jnp.float32, name="t_fc1")(temb)
        temb = nn.Dense(c.dim, dtype=jnp.float32, name="t_fc2")(nn.silu(temb))
        pemb = nn.Dense(c.dim, dtype=jnp.float32, name="p_fc1")(
            pooled.astype(jnp.float32))
        pemb = nn.Dense(c.dim, dtype=jnp.float32, name="p_fc2")(nn.silu(pemb))
        cond = temb + pemb

        for i in range(c.depth):
            img, txt = MMDiTBlock(c, final_text=(i == c.depth - 1),
                                  name=f"block_{i}")(img, txt, cond)

        # final adaLN + unpatchify
        sh, sc = jnp.split(nn.Dense(2 * c.dim, dtype=jnp.float32,
                                    kernel_init=nn.initializers.zeros,
                                    name="final_mod")(nn.silu(cond)), 2, axis=-1)
        out = modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                    dtype=jnp.float32)(img), sh, sc)
        out = nn.Dense(p * p * c.out_channels, dtype=c.dtype,
                       name="patch_out")(out.astype(c.dtype))
        out = out.reshape(b, gh, gw, p, p, c.out_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c.out_channels)
        return out.astype(jnp.float32)
