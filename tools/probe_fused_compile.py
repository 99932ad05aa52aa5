"""Probe: can this host's compile service take the FUSED 50-step IP2P loop?

bench.py deliberately times the per-step compile unit because the fused
`ip2p_edit` fori_loop program was prohibitively slow to compile through
this environment's tunneled remote-compile service (bench.py docstring).
With the persistent compile cache now in place, a ONE-TIME successful
compile would serve every later bench run from cache — and the fused
program saves 50 dispatch boundaries plus lets XLA schedule across the
step boundary (scheduler math fused into the UNet epilogue).

This tool attempts that compile with a wall-clock budget, then times the
fused edit against the per-step rate if it succeeds. Writes nothing; the
cache entry is the artifact.

Usage: python tools/probe_fused_compile.py [--steps 50] [--batch 8]
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

STEPS = int(sys.argv[sys.argv.index("--steps") + 1]) \
    if "--steps" in sys.argv else 50
N = int(sys.argv[sys.argv.index("--batch") + 1]) \
    if "--batch" in sys.argv else 8


def main():
    from anyedit_tpu.models.unet_sd import UNet2DCondition, SD15_IP2P_UNET
    from anyedit_tpu.models.vae import AutoencoderKL, SD_VAE
    from anyedit_tpu.schedulers import make_noise_schedule
    from anyedit_tpu.diffusion import ip2p_edit

    key = jax.random.key(0)
    ns = make_noise_schedule()
    unet = UNet2DCondition(SD15_IP2P_UNET)
    xs = jnp.zeros((3 * N, 64, 64, 8), jnp.bfloat16)
    ts = jnp.zeros((3 * N,), jnp.int32)
    ctx3 = jnp.zeros((3 * N, 77, 768), jnp.bfloat16)
    params = jax.jit(unet.init)(key, xs, ts, ctx3)

    vae = AutoencoderKL(SD_VAE)
    px = jax.random.normal(jax.random.fold_in(key, 2),
                           (N, 512, 512, 3), jnp.bfloat16)
    vae_params = jax.jit(vae.init)(jax.random.fold_in(key, 1), px)

    cond = jnp.zeros((N, 77, 768), jnp.bfloat16)
    uncond = jnp.zeros((N, 77, 768), jnp.bfloat16)

    @jax.jit
    def fused(params, vae_params, px, k):
        mean, _ = vae.apply(vae_params, px, method=AutoencoderKL.encode)
        img_lat = mean * SD_VAE.scaling_factor

        def eps_fn(x, t, c):
            return unet.apply(params, x, t, c)

        lat = ip2p_edit(eps_fn, ns, img_lat, cond, uncond, k,
                        num_steps=STEPS, guidance_scale=8.0,
                        image_guidance_scale=0.9)
        return vae.apply(vae_params,
                         (lat / SD_VAE.scaling_factor).astype(jnp.bfloat16),
                         method=AutoencoderKL.decode)

    def sync(x):
        return float(np.asarray(jax.device_get(x[0, 0, 0, 0])))

    print(f"compiling fused {STEPS}-step batch-{N} program "
          f"(this is the probe)...", flush=True)
    t0 = time.perf_counter()
    out = fused(params, vae_params, px, key)
    sync(out)
    t_compile = time.perf_counter() - t0
    print(f"COMPILED+ran in {t_compile:.1f}s", flush=True)

    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        sync(fused(params, vae_params, px, jax.random.fold_in(key, i)))
        best = min(best, time.perf_counter() - t0)
    rate = 3600.0 / best * N
    print(f"fused: {best:.2f}s per {N}-pair batch = "
          f"{rate:.1f} pairs/hr/chip", flush=True)


if __name__ == "__main__":
    main()
