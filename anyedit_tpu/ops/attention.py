"""Attention for the diffusion/vision stacks: Pallas flash kernel + XLA path.

This is the TPU-native replacement for the reference's torch SDPA /
xformers calls inside `ldm/modules/attention.py:145` (CrossAttention), the
diffusers UNet attention processors, SAM/Swin window attention, etc.

Design:
  * `flash_attention` — online-softmax Pallas kernel. Grid is
    (batch*heads, q_blocks); K/V for one head live in VMEM (≤2 MB for
    4096×128 bf16) and are consumed in BK-sized chunks with a running
    (max, sum) rescale. FLOPs hit the MXU as (BQ×D)·(D×BK) matmuls.
  * `sdpa_xla` — plain jnp reference (XLA fuses this well; also the
    numerical oracle for tests).
  * `attention` — public entry: pads head_dim→128 lanes and kv_len→block
    multiple (mask-correct), picks the kernel, unpads.

Head dims in the model zoo are 40/64/80/160 (SD1.5/SAM/CLIP) — never
128-aligned, so the pad/unpad here is what keeps the MXU fully tiled.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def sdpa_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
             scale: float | None = None,
             bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference attention. q,k,v: (B, H, L, D)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                  block_k: int):
    """One (head, q-block): online softmax over kv chunks."""
    q = q_ref[0].astype(jnp.float32) * scale          # (BQ, D)
    bq = q.shape[0]
    d = q.shape[1]
    n_chunks = k_ref.shape[1] // block_k

    def chunk(ci, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(ci * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(ci * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (BQ, BK)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ci * block_k
        s = jnp.where(col < kv_len, s, -jnp.inf)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_chunks, chunk, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, kv_len: int,
                    block_q: int = 256, block_k: int = 512,
                    interpret: bool = False) -> jnp.ndarray:
    """Padded-shape flash attention. q: (BH, Lq, D), k/v: (BH, Lkv, D).

    Lq % block_q == 0, Lkv % block_k == 0, D % 128 == 0 (callers pad).
    `kv_len` masks the key padding.
    """
    bh, lq, d = q.shape
    lkv = k.shape[1]
    grid = (bh, lq // block_q)
    kernel = functools.partial(_flash_kernel, scale=scale, kv_len=kv_len,
                               block_k=block_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkv, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkv, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq * lkv * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=bh * lq * lkv,
        ),
        interpret=interpret,
    )(q, k, v)


_LOG2E = 1.4426950408889634
# Logit clamp for the max-free kernel: exact for base-2 logits ≤ 80
# (natural-log logits ≤ 55 — far above anything SD-family UNets produce);
# beyond that softmax saturates gracefully instead of overflowing f32.
_NOMAX_CLAMP = 80.0


def _flash_nomax_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Max-free single-pass softmax: p = 2^(s·log2e·scale), no running-max
    rescale. With the max/correction passes gone, the remaining VPU work
    (exp2 + row-sum) hides entirely behind the two matmuls: on the SD1.5
    level-0 shape (BH=192, S=4096, D=40→128, v5e, properly-fenced chained
    timing) this kernel = 9.73 ms, a matmuls-only probe = 9.72 ms, and the
    pad-adjusted MXU bound (D padded 40→128 → 3.2× dense work) = 8.4 ms —
    i.e. 86% of the reachable speed of light; XLA sits at ~12.5 ms and the
    with-max online kernel at ~13.5. Do NOT try to optimize the softmax
    further (a fused row-sum-in-PV-padding-lane variant measured 10.01 ms
    and regressed the e2e bench); the 3.2× lane pad on QK^T/PV is
    information-theoretically locked to the MXU's dense 128-lane tiles for
    per-head D=40."""
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(jnp.minimum(s, _NOMAX_CLAMP))
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(jnp.bfloat16), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[0] = (pv / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_nomax(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                block_q: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Unmasked self-attention, padded shapes. q/k/v: (BH, L, D) with
    D % 128 == 0 and L % block_q == 0; kv is NOT padded (zero-padded K
    columns would each contribute exp2(0)=1 to the sum)."""
    bh, l, d = q.shape
    kernel = functools.partial(_flash_nomax_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(bh, l // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, l, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l * l * d,
            bytes_accessed=4 * bh * l * d * q.dtype.itemsize,
            transcendentals=bh * l * l,
        ),
        interpret=interpret,
    )(q, k, v)


def _flash_int8_kernel(fac_ref, q_ref, k_ref, v_ref, sv_ref, o_ref, *,
                       kv_len: int, block_k: int):
    """Online-softmax flash with INT8 matmuls (one (head, q-block)).

    Scale granularity (each the finest that keeps the contraction linear):
      * q — per-ROW, computed IN-kernel from the fp32 q block (rows are
        softmax-independent, so a row factor folds into the logits);
      * k — per-TENSOR, quantized by the caller; `fac_ref[0]` (SMEM) =
        scale_k · softmax_scale;
      * v — per-CHANNEL (`sv_ref`, (1, D)); constant across kv chunks, so
        it factors out of the online accumulation and is applied once at
        the end (exact);
      * p — fixed /127 grid: probs live in (0, 1] after the running-max
        subtraction, so the grid is exact-range.
    Both contractions hit the MXU's int8 path (~2× the bf16 rate on
    v5e); softmax stays fp32.
    """
    kf = fac_ref[0]
    q = q_ref[0].astype(jnp.float32)                  # (BQ, D) fp32
    bq, d = q.shape
    sq = jnp.maximum(jnp.max(jnp.abs(q), axis=-1, keepdims=True),
                     1e-8) / 127.0                    # (BQ, 1)
    q8 = jnp.round(q / sq).astype(jnp.int8)           # |·| ≤ 127 by constr.
    row_f = sq * kf                                   # (BQ, 1)
    n_chunks = k_ref.shape[1] // block_k

    def chunk(ci, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(ci * block_k, block_k), :]            # int8
        v = v_ref[0, pl.ds(ci * block_k, block_k), :]            # int8
        s32 = jax.lax.dot_general(q8, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * row_f
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ci * block_k
        s = jnp.where(col < kv_len, s, -jnp.inf)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                                   # (0, 1]
        p8 = jnp.round(p * 127.0).astype(jnp.int8)
        pv = jax.lax.dot_general(p8, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * correction + pv.astype(jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_chunks, chunk, (acc0, m0, l0))
    out = acc * (sv_ref[0] / 127.0) / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


def flash_int8(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
               block_q: int = 512, block_k: int = 512,
               kv_len: int | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """INT8-matmul flash attention on padded shapes. q/k/v: (BH, L, D)
    float; quantization happens here (q per-row in-kernel, k per-tensor,
    v per-channel). D % 128 == 0 and L % block_q == 0 == L % block_k. A
    caller that pads L must pass the TRUE key count as `kv_len` so padded
    columns are masked to -inf before the softmax (default: L)."""
    bh, l, d = q.shape
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-8) / 127.0
    sv = jnp.maximum(jnp.max(jnp.abs(vf), axis=1, keepdims=True),
                     1e-8) / 127.0                    # (BH, 1, D)
    k8 = jnp.clip(jnp.round(kf / sk), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(vf / sv), -127, 127).astype(jnp.int8)
    fac = (sk * scale).reshape(1).astype(jnp.float32)
    sv_f = sv.astype(jnp.float32)   # kernel applies sv/127 (the p8 grid)
    kernel = functools.partial(_flash_int8_kernel,
                               kv_len=l if kv_len is None else kv_len,
                               block_k=block_k)
    return pl.pallas_call(
        kernel,
        grid=(bh, l // block_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, l, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * l * l * d,
            bytes_accessed=4 * bh * l * d,
            transcendentals=bh * l * l,
        ),
        interpret=interpret,
    )(fac, q, k8, v8, sv_f)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _self_attn_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: float) -> jnp.ndarray:
    """Differentiable wrapper over the max-free Pallas kernel.

    pallas_call has no reverse-mode AD rule, and the AnySD trainer
    (train/anysd.py value_and_grad) differentiates through the UNet's
    level-0 self-attention — so the fast path needs an explicit VJP.
    Forward: flash_nomax (pad D→128 lanes). Backward: recompute via the
    XLA sdpa (identical math; fp32 softmax both ways), i.e. a standard
    recompute-based backward — no residuals kept beyond q/k/v.
    """
    b, h, lq, d = q.shape
    dp = _ceil_to(d, _LANES)
    pad = ((0, 0), (0, 0), (0, dp - d))
    qf = jnp.pad(q.reshape(b * h, lq, d), pad)
    kf = jnp.pad(k.reshape(b * h, lq, d), pad)
    vf = jnp.pad(v.reshape(b * h, lq, d), pad)
    out = flash_nomax(qf, kf, vf, scale=scale)
    return out[..., :d].reshape(b, h, lq, d)


def _self_attn_flash_fwd(q, k, v, scale):
    return _self_attn_flash(q, k, v, scale), (q, k, v)


def _self_attn_flash_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: sdpa_xla(a, b, c, scale=scale), q, k, v)
    return vjp(g)


_self_attn_flash.defvjp(_self_attn_flash_fwd, _self_attn_flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _self_attn_int8(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """INT8 flash wrapper (pad D→128 lanes); backward recomputes via the
    fp32 XLA sdpa on the unquantized inputs (straight-through estimator —
    the int8 path is inference-only, but a stray grad must not crash)."""
    b, h, lq, d = q.shape
    dp = _ceil_to(d, _LANES)
    pad = ((0, 0), (0, 0), (0, dp - d))
    qf = jnp.pad(q.reshape(b * h, lq, d), pad)
    kf = jnp.pad(k.reshape(b * h, lq, d), pad)
    vf = jnp.pad(v.reshape(b * h, lq, d), pad)
    out = flash_int8(qf, kf, vf, scale=scale)
    return out[..., :d].reshape(b, h, lq, d)


def _self_attn_int8_fwd(q, k, v, scale):
    return _self_attn_int8(q, k, v, scale), (q, k, v)


_self_attn_int8.defvjp(_self_attn_int8_fwd, _self_attn_flash_bwd)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              scale: float | None = None, use_flash: bool | None = None,
              int8: bool = False, interpret: bool = False) -> jnp.ndarray:
    """Public attention op. q,k,v: (B, H, L, D); returns (B, H, Lq, D).

    Kernel policy (measured on v5e, SD shapes):
      * large unmasked self-attention (Lq == Lkv ≥ 1024, block-aligned):
        the max-free Pallas kernel — 1.29x XLA at the SD1.5 level-0 shape,
        where attention is ~44% of the UNet step; with `int8=True` (the
        W8A8 fast mode) the int8-matmul flash kernel instead;
      * everything else: XLA's fused attention (it wins at small/cross
        shapes, and the with-max online-softmax kernel only pays off for
        128-aligned head dims / very long kv). int8 falls back to bf16
        here — small/cross attention is not worth the quantization error.
    """
    b, h, lq, d = q.shape
    lkv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_flash is None and not interpret:
        if (lq == lkv and lq >= 1024 and lq % 512 == 0 and d <= 128
                and _on_tpu()):
            # int8 routing measured DEAD on v5e at the SD shapes
            # (tools/bench_quant_micro.py, 2026-08-19): flash_int8 17.6 ms
            # vs bf16 flash 11.8 ms at (24,8,4096,40) — head_dim 40 pads
            # to 128 lanes under the (32,128) int8 tile, so the quantize/
            # dequant work buys nothing. W8A8 mode therefore keeps the
            # bf16 flash kernel; flash_int8 stays available for future
            # 128-aligned-head checkpoints (int8=True reaches it only via
            # _self_attn_int8 callers that opt in explicitly).
            return _self_attn_flash(q, k, v, scale)
        use_flash = False
    if not use_flash:
        return sdpa_xla(q, k, v, scale=scale)

    block_q = min(256, _ceil_to(lq, 8))
    block_k = min(512, _ceil_to(lkv, _LANES))
    dp = _ceil_to(d, _LANES)
    lqp = _ceil_to(lq, block_q)
    lkvp = _ceil_to(lkv, block_k)

    def pad3(x, lp, dpad):
        return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, dpad - x.shape[2])))

    qf = pad3(q.reshape(b * h, lq, d), lqp, dp)
    kf = pad3(k.reshape(b * h, lkv, d), lkvp, dp)
    vf = pad3(v.reshape(b * h, lkv, d), lkvp, dp)
    out = flash_attention(qf, kf, vf, scale=scale, kv_len=lkv,
                          block_q=block_q, block_k=block_k, interpret=interpret)
    return out[:, :lq, :d].reshape(b, h, lq, d)
