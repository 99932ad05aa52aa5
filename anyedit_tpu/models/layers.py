"""Shared building blocks for the diffusion/vision model zoo.

TPU-first conventions used across the zoo:
  * NHWC activations everywhere (feeds the MXU's conv tiling directly),
  * params live in fp32, compute in `dtype` (bf16 by default),
  * attention is the pluggable `AttnProcessor` slot — the functional
    replacement for the reference's attention monkey-patching
    (masactrl_utils.py register hooks, prompt2prompt ptp_utils), so
    MasaCtrl / P2P / IP-Adapter become *arguments*, not surgery.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from anyedit_tpu.ops.attention import attention as attention_op


@dataclasses.dataclass(frozen=True)
class AttnMeta:
    """Static identity of one attention site (used by processors to route)."""

    name: str           # unique path, e.g. "down_1.tf_0.self"
    is_self: bool
    num_heads: int
    head_dim: int


# AttnProcessor: (q, k, v, meta, extra) -> out. q,k,v: (B, H, L, D).
AttnProcessor = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, AttnMeta,
                          Optional[dict[str, Any]]], jnp.ndarray]


def default_processor(q, k, v, meta: AttnMeta, extra=None):
    del meta, extra
    return attention_op(q, k, v)


def int8_processor(q, k, v, meta: AttnMeta, extra=None):
    """W8A8 fast-mode attention. Routes to the SAME bf16 kernels as the
    default: flash_int8 measured 1.5x SLOWER at the SD level-0 shape
    (head_dim 40 pads to 128 lanes under the int8 tile — see
    ops/attention.py routing note + tools/bench_quant_micro.py), so int8
    in this mode means int8 convs/denses only."""
    del meta, extra
    return attention_op(q, k, v, int8=True)


class MultiHeadAttention(nn.Module):
    """Projection wrapper around the processor slot."""

    num_heads: int
    head_dim: int
    out_dim: int
    name_tag: str
    is_self: bool
    dtype: Any = jnp.bfloat16
    qkv_bias: bool = False
    quant: bool = False      # W8A8 projections (ops/quant.py fast mode)

    @nn.compact
    def __call__(self, x, context=None, processor: AttnProcessor | None = None,
                 extra=None):
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        from anyedit_tpu.ops.quant import make_dense
        dense = lambda n, d, b=self.qkv_bias: make_dense(
            d, quant=self.quant, use_bias=b, dtype=self.dtype, name=n)
        q = dense("to_q", inner)(x)
        k = dense("to_k", inner)(context)
        v = dense("to_v", inner)(context)
        b, lq = q.shape[0], q.shape[1]
        lkv = k.shape[1]
        split = lambda t, l: t.reshape(b, l, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q, lq), split(k, lkv), split(v, lkv)
        meta = AttnMeta(self.name_tag, self.is_self, self.num_heads, self.head_dim)
        proc = processor or (int8_processor if self.quant
                             else default_processor)
        out = proc(q, k, v, meta, extra)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, inner)
        return dense("to_out", self.out_dim, True)(out)


class GroupNorm(nn.Module):
    """fp32-stat GroupNorm over NHWC (optionally fused SiLU)."""

    num_groups: int = 32
    eps: float = 1e-5
    silu: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # NOTE on the fused Pallas GN (ops/groupnorm.py): isolated it wins
        # −21% at the SD L0 shape, but routing THIS module through it made
        # the full UNet 2.8% SLOWER (bench.py 2,947.5 vs 3,032.6 pairs/hr,
        # 2026-08-20) — the pallas_call is a fusion boundary, and XLA's
        # fusion of this math into the producing residual/temb adds is
        # worth more than the kernel's saved round-trip. The XLA path
        # below therefore stays; full account in ops/groupnorm.py +
        # docs/perf_roofline.md.
        xf = x.astype(jnp.float32)
        g = self.num_groups
        n = xf.shape[0]
        # Keep every BIG-tensor op in native channel-last layout: reduce to
        # per-channel stats (N, C) first, combine channels→groups on the
        # tiny stats tensor only. Reshaping the full activation to
        # (..., G, C/G) puts C/G (10 for SD's 320ch/32g) in the lane dim —
        # a pathological TPU tiling that forces relayout copies.
        red = tuple(range(1, xf.ndim - 1))
        m_c = jnp.mean(xf, axis=red)                    # (N, C)
        # Two-pass per-channel variance (jnp.var subtracts the mean before
        # squaring) — the one-pass E[x²]−E[x]² form cancels catastrophically
        # in fp32 when |mean| ≫ std (error ~0.02 observed on high-magnitude
        # spatially-flat features ⇒ wrong inverse scale, or NaN when it goes
        # negative). Both passes stay in native channel-last layout.
        v_c = jnp.var(xf, axis=red)                     # (N, C)
        m_g = jnp.mean(m_c.reshape(n, g, c // g), axis=-1)      # (N, G)
        # pooled group variance = E_g[var_c + (m_c − m_g)²]: within-channel
        # variance plus between-channel spread, combined on the tiny (N, C)
        # stats tensor only — no cancellation (differences of like-scale
        # means, squared after subtraction).
        d_c = m_c - jnp.repeat(m_g, c // g, axis=-1)
        var_g = jnp.mean((v_c + jnp.square(d_c)).reshape(n, g, c // g),
                         axis=-1)
        inv_g = jax.lax.rsqrt(var_g + self.eps)
        inv_c = jnp.repeat(inv_g, c // g, axis=-1)      # (N, C)
        mean_c = jnp.repeat(m_g, c // g, axis=-1)
        a = inv_c * scale                               # (N, C)
        b = bias - mean_c * a
        bshape = (n,) + (1,) * (xf.ndim - 2) + (c,)
        y = xf * a.reshape(bshape) + b.reshape(bshape)
        if self.silu:
            y = y * jax.nn.sigmoid(y)
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    dtype: Any = jnp.bfloat16
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(self.dtype)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (SD convention)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / (half - downscale_freq_shift))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Conv3x3(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    quant: bool = False      # W8A8 (ops/quant.py); inner module keeps the
                             # float auto-name "Conv_0" so param paths match

    @nn.compact
    def __call__(self, x):
        if self.quant:
            from anyedit_tpu.ops.quant import QuantConv
            # explicit name keeps the float auto-name "Conv_0" so the
            # quant/float param trees walk by identical paths
            return QuantConv(self.features, (3, 3), self.stride,
                             ((1, 1), (1, 1)), dtype=self.dtype,
                             name="Conv_0")(x)
        return nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                       padding=((1, 1), (1, 1)), dtype=self.dtype)(x)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        from anyedit_tpu.ops.quant import make_dense
        # explicit name "Dense_0" keeps the float tree's auto-name so
        # quantize_params walks both trees by identical paths
        h = make_dense(self.dim_out * 2, quant=self.quant, dtype=self.dtype,
                       name="Dense_0")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return a * jax.nn.gelu(g)


class FeedForward(nn.Module):
    mult: int = 4
    dtype: Any = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        from anyedit_tpu.ops.quant import make_dense
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, dtype=self.dtype, quant=self.quant)(x)
        return make_dense(dim, quant=self.quant, dtype=self.dtype,
                          name="Dense_0")(h)
