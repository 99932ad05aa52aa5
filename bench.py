"""Factory benchmark: edited pairs/hour/chip at 512px, 50-step DDIM.

Measures the flagship editing path — the fully-jitted InstructPix2Pix
3-way-CFG DDIM loop (`anyedit_tpu.diffusion.ip2p_edit`) on the SD1.5-class
UNet at 512×512 (64×64 latents, bf16) plus VAE encode/decode — with
randomly initialized weights (throughput is weight-independent).

Each denoise step is one jitted call (params traced, never baked as
constants); steps chain data-dependently (x_{i+1} = f(x_i)), so the timing
cannot be faked by async dispatch or remote-execution caching. (The fully
fused `ip2p_edit` fori_loop is the production path, but this environment's
remote-compile service is prohibitively slow on the 50-step program, so the
benchmark uses the per-step compile unit.)

Baseline: the reference pipeline (tools/global_tool.py DDIM loop) on A100.
The repo publishes no throughput number (SURVEY.md §6), so the comparison
point is the widely reproduced SD1.5 fp16+xformers A100 rate (~20
UNet-fwd/s at 512px batch1 → ~7/s at batch-3 CFG): 50 steps + VAE ≈ 5.0 s
per image ≈ 720 pairs/hour/A100.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

A100_BASELINE_PAIRS_PER_HOUR = 720.0
STEPS = 50
# --int8: opt-in W8A8 fast mode (ops/quant.py) — the headline metric the
# driver records stays bf16 (the parity workload); int8 is the documented
# "faster than parity" mode, measured manually and recorded in
# docs/perf_roofline.md.
INT8 = "--int8" in sys.argv or os.environ.get("BENCH_INT8") == "1"
# --lcm: the distilled few-step consistency editor (train/distill.py
# lcm_edit) — 4 single-row UNet calls per edit vs the teacher's 50×3.
# A different workload (not the parity metric), reported as a separate
# fast-mode measurement.
LCM = "--lcm" in sys.argv or os.environ.get("BENCH_LCM") == "1"
LCM_STEPS = int(os.environ.get("BENCH_LCM_STEPS", "4"))
# Batch sweep (same program shape, bigger leading dim): measured on the
# bench chip 2026-08-17 — batch 8: 2533 pairs/hr; see PARITY.md for the
# sweep table. Overridable for experiments via BENCH_BATCH.
IMAGES_PER_BATCH = int(os.environ.get("BENCH_BATCH", "8"))


def main():
    from anyedit_tpu.models.unet_sd import UNet2DCondition, SD15_IP2P_UNET
    from anyedit_tpu.models.vae import AutoencoderKL, SD_VAE
    from anyedit_tpu.schedulers import make_noise_schedule
    from anyedit_tpu.diffusion import ip2p_edit

    key = jax.random.key(0)
    n = IMAGES_PER_BATCH
    ns = make_noise_schedule()

    cfg = SD15_IP2P_UNET
    if INT8:
        import dataclasses
        cfg = dataclasses.replace(cfg, quant=True)
    unet = UNet2DCondition(cfg)
    xs = jnp.zeros((3 * n, 64, 64, 8), jnp.bfloat16)
    ts = jnp.zeros((3 * n,), jnp.int32)
    ctx3 = jnp.zeros((3 * n, 77, 768), jnp.bfloat16)
    if INT8:
        # quantize a float random init (same path a real checkpoint takes)
        from anyedit_tpu.ops.quant import quantize_params
        fl = UNet2DCondition(SD15_IP2P_UNET)
        fparams = jax.jit(fl.init)(key, xs, ts, ctx3)
        shapes = jax.eval_shape(lambda: unet.init(key, xs, ts, ctx3))
        unet_params = {"params": jax.jit(
            lambda fp: quantize_params(shapes["params"], fp))(
                fparams["params"])}
    else:
        unet_params = jax.jit(unet.init)(key, xs, ts, ctx3)

    vae = AutoencoderKL(SD_VAE)
    px = jax.random.normal(jax.random.fold_in(key, 2),
                           (n, 512, 512, 3), jnp.bfloat16)
    vae_params = jax.jit(vae.init)(jax.random.fold_in(key, 1), px)

    ctx = jnp.zeros((n, 77, 768), jnp.bfloat16)
    from anyedit_tpu.schedulers import ddim_init, ddim_step
    st = ddim_init(ns, STEPS)

    @jax.jit
    def encode(vae_params, pixels):
        mean, _ = vae.apply(vae_params, pixels, method=AutoencoderKL.encode)
        return mean * SD_VAE.scaling_factor

    @jax.jit
    def decode(vae_params, lat):
        return vae.apply(vae_params, (lat / SD_VAE.scaling_factor).astype(jnp.bfloat16),
                         method=AutoencoderKL.decode)

    @jax.jit
    def step(unet_params, lat, img_lat, i):
        lat3 = jnp.concatenate([lat, lat, lat], axis=0)
        img_cond = jnp.concatenate(
            [img_lat, img_lat, jnp.zeros_like(img_lat)], axis=0)
        eps3 = unet.apply(unet_params,
                          jnp.concatenate([lat3, img_cond], axis=-1),
                          jnp.full((3 * n,), st.timesteps[i]), ctx3)
        e_full, e_img, e_unc = jnp.split(eps3, 3, axis=0)
        eps = e_unc + 8.0 * (e_full - e_img) + 0.9 * (e_img - e_unc)
        return ddim_step(ns, st, i, eps, lat)

    def edit_batch(k):
        img_lat = encode(vae_params, px)
        lat = jax.random.normal(k, img_lat.shape, jnp.float32)
        for i in range(STEPS):
            lat = step(unet_params, lat, img_lat, jnp.asarray(i))
        return decode(vae_params, lat)

    if LCM:
        # few-step consistency editor: ONE UNet row per step (guidance
        # folded into the distilled weights), fused fori_loop program
        from anyedit_tpu.train.distill import DistillConfig, lcm_edit
        dcfg = DistillConfig(unet=cfg)
        lcm_fn = jax.jit(lambda p, img_lat, k: lcm_edit(
            unet.apply, p, ns, dcfg, img_lat, ctx, k,
            num_steps=LCM_STEPS))

        def edit_batch(k):
            img_lat = encode(vae_params, px)
            return decode(vae_params, lcm_fn(unet_params, img_lat, k))

    import numpy as _np

    def sync(x):
        # On tunneled backends `block_until_ready` can return before remote
        # execution finishes; a host readback of one element is the only
        # airtight fence (the value depends on the full 50-step chain).
        return float(_np.asarray(jax.device_get(x[0, 0, 0, 0])))

    sync(edit_batch(key))  # compile all three programs

    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = edit_batch(jax.random.fold_in(key, i))
        sync(out)
        best = min(best, time.perf_counter() - t0)

    pairs_per_hour = 3600.0 / best * n
    if LCM:
        desc = ("512px, %d-step LCM consistency editor (distilled, "
                "guidance folded)%s" % (
                    LCM_STEPS, ", W8A8 int8 UNet" if INT8 else ""))
    else:
        desc = ("512px, 50-step DDIM, 3-way CFG IP2P%s" % (
            ", W8A8 int8 UNet" if INT8 else ""))
    line = {
        "metric": "edited pairs/hour/chip (%s)" % desc,
        "value": round(pairs_per_hour, 1),
        "unit": "pairs/hour/chip",
        "vs_baseline": round(pairs_per_hour / A100_BASELINE_PAIRS_PER_HOUR, 2),
    }
    # secondary evidence: the end-to-end factory stream (pre_filter → ground
    # → edit → post_filter, tools/bench_factory.py) is too compile-heavy to
    # re-run inside the driver's bench window on this tunneled host, so its
    # most recent measured result rides along from the committed record.
    fb = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "docs", "factory_bench.json")
    if os.path.exists(fb):
        try:
            with open(fb) as f:
                r = json.load(f)
            line["factory_stream"] = {
                "records_per_hour_chip": r.get("records_per_hour_chip"),
                # chunk mode (batched CLIP + batched edits) is the
                # production path; its blended rate leads when measured
                "batched_records_per_hour_chip": r.get(
                    "batched_full_path_records_per_hour_chip"),
                "records": r.get("records"),
                "measured_utc": r.get("measured_utc"),
                "note": r.get("note"),
            }
        except (OSError, ValueError):
            pass
    # measured fast modes + production grounding stage times ride along
    # (docs/fast_modes.json, measured on this chip — see perf_roofline.md)
    fm = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "docs", "fast_modes.json")
    if os.path.exists(fm):
        try:
            with open(fm) as f:
                line["fast_modes"] = json.load(f)
        except (OSError, ValueError):
            pass
    print(json.dumps(line))


if __name__ == "__main__":
    main()
