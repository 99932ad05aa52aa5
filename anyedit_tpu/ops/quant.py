"""W8A8 int8 quantization for the diffusion hot path (opt-in fast mode).

TPU v5e's MXU runs int8×int8→int32 at ~2× the bf16 rate (394 vs 197
TOPS), and the flagship IP2P UNet spends ~85% of its FLOPs in convs and
dense projections (docs/perf_roofline.md) — so an int8 compute path is
the single largest remaining throughput lever after the bf16 roofline
was reached. This module provides:

  * `QuantDense` / `QuantConv` — drop-in Flax modules storing a
    per-output-channel symmetric int8 kernel (+fp32 scale) and
    quantizing activations dynamically at runtime (per-row for Dense,
    per-sample for conv — the finest granularity that keeps the scaled
    contraction linear); accumulation is int32
    (`preferred_element_type`), dequant to the module dtype.
  * `quantize_params` — walks a float param tree and the quantized
    model's shape tree in lockstep, converting every `kernel` the quant
    model declares as `kernel_q` into (int8 kernel, per-channel scale).

Design notes (TPU-first, not a port — the reference has no quantized
path at all):
  * symmetric signed quantization, clip to ±127 (avoids the -128
    asymmetry); per-OUTPUT-channel weight scales keep the dequant a
    cheap per-lane multiply after the int32 accumulator;
  * activation scales are dynamic VPU absmax reductions — negligible
    next to the matmul they feed — and the dequant stays a rank-1
    multiply fusable into the accumulator epilogue;
  * first/last convs and time/positional embeds stay bf16 (standard
    W8A8 diffusion practice — they are <1% of FLOPs and carry the
    widest dynamic range).

Quality: W8A8 with per-channel weights is the established
Q-Diffusion/SmoothQuant operating point for SD-class UNets; the bf16
path remains the default and the parity metric. `tests/test_quant.py`
bounds the per-layer and end-to-end drift. Future lever for real
checkpoints with activation outliers: SmoothQuant-style scale migration
(fold per-channel activation ranges into the preceding norm gain before
quantizing) — a pure `quantize_params`-time transform, no kernel change.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-8


def absmax_scale(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Symmetric quantization scale so that absmax(x) maps to 127."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return jnp.maximum(amax, _EPS) / 127.0


def quantize_int8(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _int8_kernel_init(key, shape, dtype=jnp.int8):
    """Random-init fallback (hermetic runs): uniform int8 body."""
    return jax.random.randint(key, shape, -127, 128, jnp.int32).astype(dtype)


class QuantDense(nn.Module):
    """W8A8 Dense: int8 kernel (in,out) + per-out-channel fp32 scale."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kq = self.param("kernel_q", _int8_kernel_init, (in_f, self.features))
        # scale init ~ lecun-normal magnitude spread over the int8 grid
        ks = self.param("kernel_scale",
                        lambda k, s: jnp.full(s, 1.0 / (127.0 * in_f ** 0.5),
                                              jnp.float32),
                        (self.features,))
        # per-ROW activation scale (dot contracts only the last dim, so a
        # row-wise scale stays linear); the dequant is the rank-1 outer
        # product row_scale × channel_scale fused into the int32 epilogue.
        xs = absmax_scale(x, axis=-1)              # (..., 1) dynamic
        xq = quantize_int8(x, xs)
        acc = jax.lax.dot_general(
            xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (xs * ks)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        return y.astype(self.dtype)


class QuantConv(nn.Module):
    """W8A8 NHWC conv: int8 HWIO kernel + per-out-channel fp32 scale."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Sequence[tuple[int, int]] | str = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_f = x.shape[-1]
        fan_in = kh * kw * in_f
        kq = self.param("kernel_q", _int8_kernel_init,
                        (kh, kw, in_f, self.features))
        ks = self.param("kernel_scale",
                        lambda k, s: jnp.full(s, 1.0 / (127.0 * fan_in ** 0.5),
                                              jnp.float32),
                        (self.features,))
        # per-SAMPLE activation scale (conv mixes H/W/C inside the window —
        # finer-grained scales would break linearity — but never batch).
        xs = absmax_scale(x, axis=(1, 2, 3))       # (N,1,1,1) dynamic
        xq = quantize_int8(x, xs)
        acc = jax.lax.conv_general_dilated(
            xq, kq, window_strides=(self.stride, self.stride),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (xs * ks)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        return y.astype(self.dtype)


def make_dense(features: int, *, quant: bool, dtype, name: str,
               use_bias: bool = True) -> nn.Module:
    """nn.Dense or its W8A8 drop-in — the ONE place the quant/float
    construction choice lives (used by every quantizable backbone)."""
    if quant:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def make_conv1x1(features: int, *, quant: bool, dtype, name: str) -> nn.Module:
    """1×1 nn.Conv or its W8A8 drop-in (projection convs)."""
    if quant:
        return QuantConv(features, (1, 1), padding=((0, 0), (0, 0)),
                         dtype=dtype, name=name)
    return nn.Conv(features, (1, 1), dtype=dtype, name=name)


def quantize_kernel(kernel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Float kernel (..., out) → (int8 kernel, per-out-channel scale)."""
    axes = tuple(range(kernel.ndim - 1))
    scale = absmax_scale(kernel, axis=axes)        # (1,...,out)
    kq = quantize_int8(kernel, scale)
    return kq, scale.reshape(-1).astype(jnp.float32)


def quantize_params(target_shapes, float_params):
    """Convert a float param tree into the quantized model's tree.

    `target_shapes` is the quantized model's param tree from
    `jax.eval_shape(qmodel.init, ...)`; wherever it declares `kernel_q`
    + `kernel_scale`, the float tree's same-path `kernel` is quantized
    per-output-channel; every other leaf is copied (dtype-cast to the
    target's dtype). Raises KeyError on a structural mismatch so a
    wrong pairing fails loudly instead of running half-random.
    """
    def walk(tgt, flt, path=""):
        if not isinstance(tgt, dict):
            if flt is None:
                raise KeyError(f"missing float param at {path}")
            return jnp.asarray(flt, getattr(tgt, "dtype", None))
        out = {}
        handled = set()
        for name, sub in tgt.items():
            if name == "kernel_q":
                if "kernel" not in flt:
                    raise KeyError(f"no float kernel to quantize at {path}")
                kq, ks = quantize_kernel(jnp.asarray(flt["kernel"]))
                if kq.shape != sub.shape:
                    raise KeyError(
                        f"kernel shape mismatch at {path}: float "
                        f"{kq.shape} vs quant {sub.shape}")
                out["kernel_q"] = kq
                out["kernel_scale"] = ks
                handled.update(("kernel_q", "kernel_scale"))
            elif name in handled:
                continue
            elif name == "kernel_scale":
                handled.add(name)  # produced with kernel_q above
                if "kernel_q" not in tgt:
                    raise KeyError(f"kernel_scale without kernel_q at {path}")
            else:
                src = flt.get(name) if isinstance(flt, dict) else None
                if src is None:
                    raise KeyError(f"missing float param at {path}/{name}")
                out[name] = walk(sub, src, f"{path}/{name}")
        return out

    return walk(target_shapes, float_params)
