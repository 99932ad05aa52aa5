"""Flux-class rectified-flow transformer (textual_change's generator).

Capability parity with the reference's use of `FluxPipeline` (flux-schnell,
4-step, textual_change_tool.py:41 and local_pipeline_tool.py:132 source
synthesis), rebuilt TPU-first:
  * double-stream blocks = MM-DiT-style joint attention with per-stream
    modulation; single-stream blocks fuse attention+MLP in one pair of
    matmuls (Flux's parallel formulation — two big MXU GEMMs per block),
  * 3-axis RoPE (batch/time=0, h, w) applied to q/k per head,
  * conditioning vector = timestep ⊕ (optional) guidance ⊕ pooled CLIP.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.models.layers import timestep_embedding
from anyedit_tpu.models.mmdit import _RMSNormQK, modulate
from anyedit_tpu.ops.attention import sdpa_xla


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 16
    patch: int = 2
    dim: int = 3072
    heads: int = 24
    double_depth: int = 19
    single_depth: int = 38
    context_dim: int = 4096
    pooled_dim: int = 768
    axes_dim: tuple[int, ...] = (16, 56, 56)   # sums to head_dim 128
    guidance_embed: bool = False               # schnell: False, dev: True
    dtype: Any = jnp.bfloat16
    # W8A8 int8 fast mode (ops/quant.py): block qkv/proj/FFN denses go
    # int8; modulation, embeds, RoPE/attention and the head stay float.
    quant: bool = False


FLUX_SCHNELL = FluxConfig()
FLUX_DEV = FluxConfig(guidance_embed=True)
TINY_FLUX = FluxConfig(in_channels=4, dim=32, heads=2, double_depth=1,
                       single_depth=2, context_dim=16, pooled_dim=8,
                       axes_dim=(4, 6, 6))


def rope_freqs(ids: jnp.ndarray, axes_dim: tuple[int, ...],
               theta: float = 10000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ids (L, n_axes) → (cos, sin) of shape (L, head_dim/2)."""
    parts_cos, parts_sin = [], []
    for ax, d in enumerate(axes_dim):
        half = d // 2
        freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
        ang = ids[:, ax:ax + 1].astype(jnp.float32) * freqs[None]
        parts_cos.append(jnp.cos(ang))
        parts_sin.append(jnp.sin(ang))
    return jnp.concatenate(parts_cos, -1), jnp.concatenate(parts_sin, -1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, L, D) with D = 2·|cos|; rotate interleaved pairs."""
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    c = cos[None, None]
    s = sin[None, None]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def make_ids(gh: int, gw: int, txt_len: int) -> jnp.ndarray:
    """Token ids (txt_len + gh·gw, 3): text ids zero; image ids (0, h, w)."""
    txt = jnp.zeros((txt_len, 3), jnp.float32)
    hh = jnp.repeat(jnp.arange(gh, dtype=jnp.float32), gw)
    ww = jnp.tile(jnp.arange(gw, dtype=jnp.float32), gh)
    img = jnp.stack([jnp.zeros_like(hh), hh, ww], axis=-1)
    return jnp.concatenate([txt, img], axis=0)


class DoubleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, cond, cos, sin):
        c = self.cfg
        d, hd = c.dim, c.dim // c.heads
        lt = txt.shape[1]
        from anyedit_tpu.ops.quant import make_dense
        dense = lambda n, f: make_dense(f, quant=c.quant, dtype=c.dtype,
                                        name=n)

        def mods(name, n):
            m = nn.Dense(n * d, dtype=jnp.float32, name=name,
                         kernel_init=nn.initializers.zeros)(nn.silu(cond))
            return jnp.split(m, n, axis=-1)

        si1, sc1, g1, si2, sc2, g2 = mods("img_mod", 6)
        ti1, tc1, tg1, ti2, tc2, tg2 = mods("txt_mod", 6)
        ln = lambda x: nn.LayerNorm(use_bias=False, use_scale=False,
                                    dtype=jnp.float32)(x.astype(jnp.float32))

        def qkv(x, prefix):
            h = dense(f"{prefix}_qkv", 3 * d)(x)
            q, k, v = jnp.split(h, 3, axis=-1)
            sp = lambda t: t.reshape(t.shape[0], t.shape[1], c.heads, hd
                                     ).transpose(0, 2, 1, 3)
            q = _RMSNormQK(name=f"{prefix}_qn")(sp(q))
            k = _RMSNormQK(name=f"{prefix}_kn")(sp(k))
            return q, k, sp(v)

        img_n = modulate(ln(img), si1, sc1).astype(c.dtype)
        txt_n = modulate(ln(txt), ti1, tc1).astype(c.dtype)
        qi, ki, vi = qkv(img_n, "img")
        qt, kt, vt = qkv(txt_n, "txt")
        q = jnp.concatenate([qt, qi], axis=2)
        k = jnp.concatenate([kt, ki], axis=2)
        v = jnp.concatenate([vt, vi], axis=2)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        o = sdpa_xla(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(img.shape[0], -1, d)
        ot, oi = o[:, :lt], o[:, lt:]

        img = img + g1[:, None] * dense("img_o", d)(oi).astype(jnp.float32)
        h = modulate(ln(img), si2, sc2).astype(c.dtype)
        h = dense("img_fc1", 4 * d)(h)
        img = img + g2[:, None] * dense("img_fc2", d)(
            nn.gelu(h)).astype(jnp.float32)
        txt = txt + tg1[:, None] * dense("txt_o", d)(ot).astype(jnp.float32)
        h = modulate(ln(txt), ti2, tc2).astype(c.dtype)
        h = dense("txt_fc1", 4 * d)(h)
        txt = txt + tg2[:, None] * dense("txt_fc2", d)(
            nn.gelu(h)).astype(jnp.float32)
        return img, txt


class SingleBlock(nn.Module):
    """Fused parallel attention+MLP over the joint sequence."""

    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, cond, cos, sin):
        c = self.cfg
        d, hd = c.dim, c.dim // c.heads
        m = nn.Dense(3 * d, dtype=jnp.float32, name="mod",
                     kernel_init=nn.initializers.zeros)(nn.silu(cond))
        shift, scale, gate = jnp.split(m, 3, axis=-1)
        ln = nn.LayerNorm(use_bias=False, use_scale=False,
                          dtype=jnp.float32)(x.astype(jnp.float32))
        h = modulate(ln, shift, scale).astype(c.dtype)
        from anyedit_tpu.ops.quant import make_dense
        dense = lambda n, f: make_dense(f, quant=c.quant, dtype=c.dtype,
                                        name=n)
        fused = dense("linear1", 3 * d + 4 * d)(h)
        q, k, v, mlp = jnp.split(fused, [d, 2 * d, 3 * d], axis=-1)
        sp = lambda t: t.reshape(t.shape[0], t.shape[1], c.heads, hd
                                 ).transpose(0, 2, 1, 3)
        qh = apply_rope(_RMSNormQK(name="qn")(sp(q)), cos, sin)
        kh = apply_rope(_RMSNormQK(name="kn")(sp(k)), cos, sin)
        o = sdpa_xla(qh, kh, sp(v))
        o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], -1, d)
        out = dense("linear2", d)(
            jnp.concatenate([o, nn.gelu(mlp)], axis=-1))
        return x + gate[:, None] * out.astype(jnp.float32)


class Flux(nn.Module):
    """(latents NHWC, t∈[0,1] flow time ·1000, context, pooled, guidance)
    → velocity NHWC."""

    cfg: FluxConfig = FLUX_SCHNELL

    @nn.compact
    def __call__(self, x, t, context, pooled,
                 guidance: Optional[jnp.ndarray] = None):
        c = self.cfg
        b, h, w, _ = x.shape
        p = c.patch
        gh, gw = h // p, w // p
        img = x.astype(c.dtype).reshape(b, gh, p, gw, p, x.shape[-1])
        img = img.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * x.shape[-1])
        img = nn.Dense(c.dim, dtype=c.dtype, name="img_in")(img).astype(jnp.float32)
        txt = nn.Dense(c.dim, dtype=c.dtype, name="txt_in")(
            context.astype(c.dtype)).astype(jnp.float32)

        vec = timestep_embedding(t, 256)
        vec = nn.Dense(c.dim, dtype=jnp.float32, name="t_fc1")(vec)
        vec = nn.Dense(c.dim, dtype=jnp.float32, name="t_fc2")(nn.silu(vec))
        if c.guidance_embed:
            g = timestep_embedding(guidance, 256)
            g = nn.Dense(c.dim, dtype=jnp.float32, name="g_fc1")(g)
            vec = vec + nn.Dense(c.dim, dtype=jnp.float32, name="g_fc2")(nn.silu(g))
        pv = nn.Dense(c.dim, dtype=jnp.float32, name="p_fc1")(
            pooled.astype(jnp.float32))
        vec = vec + nn.Dense(c.dim, dtype=jnp.float32, name="p_fc2")(nn.silu(pv))

        ids = make_ids(gh, gw, context.shape[1])
        cos, sin = rope_freqs(ids, c.axes_dim)

        for i in range(c.double_depth):
            img, txt = DoubleBlock(c, name=f"double_{i}")(img, txt, vec, cos, sin)
        x_seq = jnp.concatenate([txt, img], axis=1)
        for i in range(c.single_depth):
            x_seq = SingleBlock(c, name=f"single_{i}")(x_seq, vec, cos, sin)
        img = x_seq[:, context.shape[1]:]

        sh, sc = jnp.split(nn.Dense(2 * c.dim, dtype=jnp.float32,
                                    kernel_init=nn.initializers.zeros,
                                    name="final_mod")(nn.silu(vec)), 2, axis=-1)
        out = modulate(nn.LayerNorm(use_bias=False, use_scale=False,
                                    dtype=jnp.float32)(img), sh, sc)
        out = nn.Dense(p * p * c.in_channels, dtype=c.dtype,
                       name="final_out")(out.astype(c.dtype))
        out = out.reshape(b, gh, gw, p, p, c.in_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c.in_channels)
        return out.astype(jnp.float32)
