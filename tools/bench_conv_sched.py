"""Sustained-rate conv scheduling bench (the round-4 "conv-side lever").

docs/perf_roofline.md estimates level-0 conv utilisation from a
per-dispatch microbench (tools/bench_quant_micro.py). Those numbers are
contaminated: each iteration crosses the tunneled dispatch boundary 3x
(jitted op + eager mean + eager add), so ~1 ms ops bounce 2x between runs.

This tool measures the TRUE sustained MXU rate per variant by chaining
K applications inside ONE jitted `lax.scan` program (distinct weights per
step so nothing folds; the chain is data-dependent so nothing overlaps)
and reading back one element — a single dispatch amortises the tunnel.

Variants answer the VERDICT round-4 item "conv-side scheduling":
  * conv3x3 at the real UNet level shapes (320/640/1280 ch, NHWC)
  * level-0 zero-padded to 384/512 lanes (does an aligned shape beat the
    0.83-util 320-lane pad despite +44% FLOPs?)
  * im2col + dot_general formulation of the L0 conv
  * GN+SiLU+conv3x3 fused chain (prices the per-block VPU glue)
  * flash attention at the L0 shape (sustained, for the roofline table)

Prints ms/iter and sustained TFLOP/s (vs the 197 TFLOP/s v5e bf16 peak).

Usage: python tools/bench_conv_sched.py [--iters K]
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

B = 24          # bench batch: 8 pairs x 3-way CFG
PEAK = 197.0    # v5e bf16 TFLOP/s
K = 50 if "--iters" not in sys.argv else int(
    sys.argv[sys.argv.index("--iters") + 1])


def run(name, make_chain, flops_per_iter, reps=3):
    """make_chain() -> (jitted_fn, x0); fn runs K data-dependent iters."""
    fn, x0 = make_chain()
    y = fn(x0)
    float(np.asarray(jax.device_get(jnp.ravel(y)[0])))  # compile + fence
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = fn(x0)
        float(np.asarray(jax.device_get(jnp.ravel(y)[0])))
        best = min(best, time.perf_counter() - t0)
    ms = best / K * 1e3
    tf = flops_per_iter / (ms / 1e3) / 1e12
    print(f"{name:42} {ms:8.3f} ms/iter  {tf:6.1f} TFLOP/s "
          f"({tf / PEAK * 100:4.1f}% peak)", flush=True)
    return ms


def conv_chain(s, c, pad_to=None):
    """K chained 3x3 SAME convs, distinct weights, optional lane pad."""
    cp = pad_to or c

    def make():
        key = jax.random.key(0)
        x = jax.random.normal(key, (B, s, s, cp), jnp.bfloat16)
        w = (jax.random.normal(jax.random.key(1), (K, 3, 3, cp, cp),
                               jnp.bfloat16) * 0.02)
        if pad_to:  # zero the padded channels so math matches a 320-ch conv
            w = w.at[:, :, :, c:, :].set(0).at[:, :, :, :, c:].set(0)

        @jax.jit
        def fn(x):
            def body(h, wi):
                h = jax.lax.conv_general_dilated(
                    h, wi, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return h * (1.0 / jnp.sqrt(9.0 * cp)), ()
            h, _ = jax.lax.scan(body, x, w)
            return h
        return fn, x
    # FLOPs priced at the LOGICAL (unpadded) conv — the padded variant
    # must win on WALL TIME to pay for its extra lanes
    return make, 2 * B * s * s * 9 * c * c


def im2col_chain(s, c):
    """L0 conv as extract-patches + dot_general."""
    def make():
        x = jax.random.normal(jax.random.key(0), (B, s, s, c), jnp.bfloat16)
        w = (jax.random.normal(jax.random.key(1), (K, 9 * c, c),
                               jnp.bfloat16) * 0.02)

        @jax.jit
        def fn(x):
            def body(h, wi):
                p = jax.lax.conv_general_dilated_patches(
                    h, (3, 3), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = jnp.einsum("bhwk,kc->bhwc", p, wi)
                return h * (1.0 / jnp.sqrt(9.0 * c)), ()
            h, _ = jax.lax.scan(body, x, w)
            return h
        return fn, x
    return make, 2 * B * s * s * 9 * c * c


def gn_silu_conv_chain(s, c):
    """GroupNorm(32) + SiLU + conv3x3 per iter — the ResBlock inner shape."""
    from anyedit_tpu.models.layers import GroupNorm
    gn = GroupNorm(num_groups=32, silu=True)

    def make():
        x = jax.random.normal(jax.random.key(0), (B, s, s, c), jnp.bfloat16)
        gp = gn.init(jax.random.key(2), x)
        w = (jax.random.normal(jax.random.key(1), (K, 3, 3, c, c),
                               jnp.bfloat16) * 0.02)

        @jax.jit
        def fn(x):
            def body(h, wi):
                h = gn.apply(gp, h)
                h = jax.lax.conv_general_dilated(
                    h, wi, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return h, ()
            h, _ = jax.lax.scan(body, x, w)
            return h
        return fn, x
    return make, 2 * B * s * s * 9 * c * c


def flash_chain():
    """Sustained flash attention at the L0 self-attn shape."""
    from anyedit_tpu.ops.attention import attention as attn_op
    H, L, D = 8, 4096, 40

    def make():
        q = jax.random.normal(jax.random.key(0), (B, H, L, D), jnp.bfloat16)

        @jax.jit
        def fn(q):
            def body(h, _):
                h = attn_op(h, h, h)
                return h * 0.99, ()
            h, _ = jax.lax.scan(body, q, None, length=K)
            return h
        return fn, q
    return make, 2 * 2 * B * H * L * L * D


def main():
    print(f"batch {B}, {K} chained iters per program, best of 3 "
          f"(one dispatch per program)", flush=True)
    for tag, s, c in [("conv3x3 L0 64x64x320", 64, 320),
                      ("conv3x3 L1 32x32x640", 32, 640),
                      ("conv3x3 L2 16x16x1280", 16, 1280)]:
        mk, fl = conv_chain(s, c)
        run(tag, mk, fl)
    for pad in (384, 512):
        mk, fl = conv_chain(64, 320, pad_to=pad)
        run(f"conv3x3 L0 zero-padded to {pad}", mk, fl)
    mk, fl = im2col_chain(64, 320)
    run("conv3x3 L0 im2col+dot", mk, fl)
    mk, fl = gn_silu_conv_chain(64, 320)
    run("GN+SiLU+conv3x3 L0 (ResBlock glue)", mk, fl)
    mk, fl = flash_chain()
    run("flash attn 24x8x4096x40 (sustained)", mk, fl)


if __name__ == "__main__":
    main()
