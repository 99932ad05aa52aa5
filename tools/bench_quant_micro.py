"""Microbenchmark: int8 vs bf16 per op class at the IP2P bench shapes.

Round 4 found the full W8A8 UNet 15% SLOWER than bf16 on the chip
(2568 vs 3032 pairs/hr) despite the MXU's nominal 2x int8 rate — this
tool isolates which op class loses: 3x3 conv, 1x1 conv/dense, or the
int8 flash attention kernel, each timed at the real level-0/1 shapes of
the bench UNet (batch 24 = 8 pairs x 3-way CFG).

Chained, fenced timing (see bench.py sync rationale).

Usage: python tools/bench_quant_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.core.cache import enable_persistent_cache
enable_persistent_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def sync(x):
    return float(np.asarray(jax.device_get(jnp.ravel(x)[0])))


def chain_ms(f, x0, n_it=20):
    x = f(x0)
    sync(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(n_it):
        x = f(x)
    sync(x)
    return (time.perf_counter() - t0) / n_it * 1e3


def bench_module(name, mod, x, flops):
    p = jax.jit(mod.init)(jax.random.key(0), x)
    fwd = jax.jit(lambda px, xx: mod.apply(px, xx))

    def g(xx):
        y = fwd(p, xx)
        # keep dtype/shape closed so the chain composes
        return xx + jnp.mean(y).astype(xx.dtype) * 1e-12

    ms = chain_ms(g, x)
    print(f"{name:34} {ms:8.3f} ms   {flops / ms / 1e9 / 1e3:7.1f} TFLOP/s",
          flush=True)
    return ms


def main():
    from flax import linen as nn
    from anyedit_tpu.ops.quant import QuantConv, QuantDense

    B = 24
    cases = [
        # (tag, spatial, cin, cout) — level-0 and level-1 UNet conv shapes
        ("conv3x3 L0 64x64x320", 64, 320, 320),
        ("conv3x3 L1 32x32x640", 32, 640, 640),
        ("conv3x3 L2 16x16x1280", 16, 1280, 1280),
    ]
    for tag, s, cin, cout in cases:
        x = jax.random.normal(jax.random.key(1), (B, s, s, cin), jnp.bfloat16)
        flops = 2 * B * s * s * 9 * cin * cout
        bench_module(f"{tag} bf16",
                     nn.Conv(cout, (3, 3), padding="SAME", dtype=jnp.bfloat16),
                     x, flops)
        bench_module(f"{tag} int8",
                     QuantConv(cout, (3, 3)), x, flops)

    # lane-pad experiment (docs/perf_roofline.md "conv-side scheduling"
    # lever): does padding level-0's 320 channels to the 384 lane multiple
    # win despite +44% FLOPs? If conv384's WALL TIME beats conv320's, a
    # converter-time zero-pad of the level-0 convs pays outright.
    for tag, s, cin, cout in [("conv3x3 L0 PAD 64x64x384", 64, 384, 384),
                              ("conv3x3 L0 PAD 64x64x512", 64, 512, 512)]:
        x = jax.random.normal(jax.random.key(4), (B, s, s, cin), jnp.bfloat16)
        flops = 2 * B * s * s * 9 * cin * cout
        bench_module(f"{tag} bf16",
                     nn.Conv(cout, (3, 3), padding="SAME", dtype=jnp.bfloat16),
                     x, flops)

    for tag, l, cin, cout in [("dense L0 4096x320->2560", 4096, 320, 2560),
                              ("dense L2 256x1280->10240", 256, 1280, 10240)]:
        x = jax.random.normal(jax.random.key(2), (B, l, cin), jnp.bfloat16)
        flops = 2 * B * l * cin * cout
        bench_module(f"{tag} bf16", nn.Dense(cout, dtype=jnp.bfloat16),
                     x, flops)
        bench_module(f"{tag} int8", QuantDense(cout), x, flops)

    # flash attention: level-0 self-attn shape (B=24, H=8, L=4096, d=40)
    from anyedit_tpu.ops.attention import attention as attn_op
    q = jax.random.normal(jax.random.key(3), (B, 8, 4096, 40), jnp.bfloat16)
    aflops = 2 * 2 * B * 8 * 4096 * 4096 * 40

    def time_attn(name, **kw):
        f = jax.jit(lambda qq: attn_op(qq, qq, qq, **kw))

        def g(qq):
            y = f(qq)
            return qq + jnp.mean(y).astype(qq.dtype) * 1e-12

        ms = chain_ms(g, q)
        print(f"{name:34} {ms:8.3f} ms   {aflops / ms / 1e9 / 1e3:7.1f} TFLOP/s",
              flush=True)

    time_attn("flash L0 24x8x4096x40 bf16")
    time_attn("flash L0 24x8x4096x40 int8", int8=True)


if __name__ == "__main__":
    main()
