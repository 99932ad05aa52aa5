"""Sustained-rate conv scheduling bench (the round-4 "conv-side lever").

docs/perf_roofline.md estimates level-0 conv utilisation from a
per-dispatch microbench (tools/bench_quant_micro.py). Those numbers are
contaminated: each iteration crosses the tunneled dispatch boundary 3x
(jitted op + eager mean + eager add), so ~1 ms ops bounce 2x between runs.

Measurement design (v2, 2026-08-20): ONE jitted iteration, chained
K times by async dispatch (h carried, data-dependent), fenced ONCE by a
single-element value fetch, at two chain lengths — the per-iter cost is
the K-slope (t_long - t_short) / (K_long - K_short), which cancels the
fixed dispatch/fence overhead exactly. The v1 design (whole chain inside
one `lax.scan` program) is unusable in this environment: the chained-scan
program wedges the tunneled execution service indefinitely (execution
never completes; a subsequent trivial matmul needed a 124 s queue drain),
and closing over device-array weights additionally wedges *tracing* in
the MLIR constant handler's device→host readback. Weights are therefore
jit ARGUMENTS and programs are single-iteration.

Variants answer the VERDICT round-4 item "conv-side scheduling":
  * conv3x3 at the real UNet level shapes (320/640/1280 ch, NHWC)
  * level-0 zero-padded to 384/512 lanes (does an aligned shape beat the
    0.83-util 320-lane pad despite +44% FLOPs?)
  * im2col + dot_general formulation of the L0 conv
  * GN+SiLU+conv3x3 fused chain (prices the per-block VPU glue)
  * flash attention at the L0 shape (sustained, for the roofline table)

Prints ms/iter and sustained TFLOP/s (vs the 197 TFLOP/s v5e bf16 peak).

Usage: python tools/bench_conv_sched.py [--iters K_long]
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
K_LONG = 64 if "--iters" not in sys.argv else int(
    sys.argv[sys.argv.index("--iters") + 1])
K_SHORT = max(4, K_LONG // 4)


def _fence(h):
    float(np.asarray(jax.device_get(jnp.ravel(h)[0])))


def run(name, make_iter, flops_per_iter, reps=3):
    """make_iter() -> (fn, h0, extra). fn(h, *extra) -> h is ONE jitted
    iteration; `extra` (weights etc.) are real jit arguments."""
    fn, h0, extra = make_iter()
    _fence(fn(h0, *extra))                      # compile + warm

    def chain(k):
        best = float("inf")
        for _ in range(reps):
            h = h0
            t0 = time.perf_counter()
            for _ in range(k):
                h = fn(h, *extra)               # async dispatch, h carried
            _fence(h)
            best = min(best, time.perf_counter() - t0)
        return best

    t_s, t_l = chain(K_SHORT), chain(K_LONG)
    ms = (t_l - t_s) / (K_LONG - K_SHORT) * 1e3   # slope: fixed cost cancels
    tf = flops_per_iter / (ms / 1e3) / 1e12
    fixed_ms = (t_s - ms * 1e-3 * K_SHORT) * 1e3
    print(f"{name:42} {ms:8.3f} ms/iter  {tf:6.1f} TFLOP/s "
          f"({tf / PEAK * 100:4.1f}% peak)  [fixed {fixed_ms:.1f} ms]",
          flush=True)
    return ms


def conv_chain(s, c, pad_to=None):
    """Chained 3x3 SAME convs; optional zero-padded lane count."""
    cp = pad_to or c

    def make():
        x = jax.random.normal(jax.random.key(0), (B, s, s, cp), jnp.bfloat16)
        w = (jax.random.normal(jax.random.key(1), (3, 3, cp, cp),
                               jnp.bfloat16) * 0.02)
        if pad_to:  # zero the padded channels so math matches a 320-ch conv
            w = w.at[:, :, c:, :].set(0).at[:, :, :, c:].set(0)

        @jax.jit
        def fn(h, w):
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return h * (1.0 / jnp.sqrt(9.0 * cp))
        return fn, x, (w,)
    # FLOPs priced at the LOGICAL (unpadded) conv — the padded variant
    # must win on WALL TIME to pay for its extra lanes
    return make, 2 * B * s * s * 9 * c * c


def im2col_chain(s, c):
    """L0 conv as extract-patches + dot_general."""
    def make():
        x = jax.random.normal(jax.random.key(0), (B, s, s, c), jnp.bfloat16)
        w = (jax.random.normal(jax.random.key(1), (9 * c, c),
                               jnp.bfloat16) * 0.02)

        @jax.jit
        def fn(h, w):
            p = jax.lax.conv_general_dilated_patches(
                h, (3, 3), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = jnp.einsum("bhwk,kc->bhwc", p, w)
            return h * (1.0 / jnp.sqrt(9.0 * c))
        return fn, x, (w,)
    return make, 2 * B * s * s * 9 * c * c


def gn_silu_conv_chain(s, c):
    """GroupNorm(32) + SiLU + conv3x3 per iter — the ResBlock inner shape."""
    from anyedit_tpu.models.layers import GroupNorm
    gn = GroupNorm(num_groups=32, silu=True)

    def make():
        x = jax.random.normal(jax.random.key(0), (B, s, s, c), jnp.bfloat16)
        gp = gn.init(jax.random.key(2), x)
        w = (jax.random.normal(jax.random.key(1), (3, 3, c, c),
                               jnp.bfloat16) * 0.02)

        @jax.jit
        def fn(h, gp, w):
            h = gn.apply(gp, h)
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return h * (1.0 / jnp.sqrt(9.0 * c))
        return fn, x, (gp, w)
    return make, 2 * B * s * s * 9 * c * c


def flash_chain():
    """Sustained flash attention at the L0 self-attn shape."""
    from anyedit_tpu.ops.attention import attention as attn_op
    H, L, D = 8, 4096, 40

    def make():
        q = jax.random.normal(jax.random.key(0), (B, H, L, D), jnp.bfloat16)

        @jax.jit
        def fn(h):
            return attn_op(h, h, h) * 0.99
        return fn, q, ()
    return make, 2 * 2 * B * H * L * L * D


def main():
    print(f"batch {B}, async-dispatch chains, per-iter = K-slope over "
          f"K={K_SHORT}/{K_LONG}, best of 3", flush=True)
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
