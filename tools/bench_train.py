"""AnySD train-step throughput: steps/s and samples/s on one chip.

Measures the L6 axis at the reference's configuration (train.py:178-205:
res 256 → 32×32 latents, per-device batch 16, SD1.5 IP2P UNet frozen,
MoE adapter + task embeddings trainable). The step is the REAL
`AnySDTrainer.train_step` (denoise-MSE with conditioning dropout +
value_and_grad through the frozen UNet + optax update) — the same
program `cli.py train` jits, with params traced (core/jit.py).

Reference point: HF Accelerate InstructPix2Pix-style fine-tunes run
~2-4 it/s at this shape on one A100 (fp16, xformers) — the repo itself
publishes no number (SURVEY.md §6).

Usage: python tools/bench_train.py [--tiny]
Prints one JSON line {steps_per_s, samples_per_s, batch, latent_hw}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if "--tiny" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".scratch", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import dataclasses

    from anyedit_tpu.train.anysd import AnySDConfig, AnySDTrainer

    if "--tiny" in sys.argv:
        from anyedit_tpu.models.unet_sd import TINY_UNET
        cfg = AnySDConfig(unet=dataclasses.replace(TINY_UNET, in_channels=8),
                          image_embed_dim=16, num_image_tokens=2,
                          task_emb_dim=32)
        batch, hw, text_len = 2, 8, 7
    else:
        cfg = AnySDConfig()
        batch, hw, text_len = 16, 32, 77   # train.py:178 res 256 defaults

    trainer = AnySDTrainer(cfg)
    key = jax.random.key(0)
    adapter_p, opt_state = None, None
    unet_p, adapter_p, opt_state = trainer.init(key, latent_hw=hw,
                                                text_len=text_len)
    rng = np.random.default_rng(0)
    b = {
        "edited_latents": jnp.asarray(
            rng.normal(size=(batch, hw, hw, 4)), jnp.float32),
        "orig_latents": jnp.asarray(
            rng.normal(size=(batch, hw, hw, 4)), jnp.float32),
        "text_emb": jnp.asarray(
            rng.normal(size=(batch, text_len, cfg.unet.context_dim)),
            jnp.float32),
        "image_embed": jnp.asarray(
            rng.normal(size=(batch, cfg.image_embed_dim)), jnp.float32),
        "task_id": jnp.zeros((batch,), jnp.int32),
    }

    step = jax.jit(trainer.train_step)

    def sync(x):
        return float(np.asarray(jax.device_get(x)))

    t0 = time.perf_counter()
    adapter_p, opt_state, loss = step(adapter_p, opt_state, unet_p, b, key)
    sync(loss)
    compile_s = time.perf_counter() - t0
    print(f"# compile: {compile_s:.1f}s", file=sys.stderr, flush=True)

    iters = 3 if "--tiny" in sys.argv else 10
    best = float("inf")
    for i in range(iters):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        adapter_p, opt_state, loss = step(adapter_p, opt_state, unet_p, b, k)
        sync(loss)
        best = min(best, time.perf_counter() - t0)

    label = ("AnySD train steps/s (tiny hermetic)" if "--tiny" in sys.argv
             else "AnySD train steps/s/chip (res 256, batch 16, SD1.5 IP2P)")
    print(json.dumps({
        "metric": label,
        "steps_per_s": round(1.0 / best, 3),
        "samples_per_s": round(batch / best, 1),
        "batch": batch, "latent_hw": hw,
        "loss_finite": bool(np.isfinite(sync(loss))),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
