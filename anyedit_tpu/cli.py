"""`python -m anyedit_tpu` — the factory CLI.

One entry point replaces the reference's 20 launch scripts (scripts/*.sh:
`CUDA_VISIBLE_DEVICES=$1 python <task>_tool.py --start-idx --end-idx ...`).

  run       stream records through pre_filter → edit → post_filter
  filter    run only the pre/post filter gates over existing records
  bench     throughput benchmark (same as bench.py)
  export    ledger → reference-format result JSONs
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def tiny_zoo_config():
    """Hermetic smoke configuration: tiny random models, small buckets —
    covers EVERY toolbox slot so `run --tiny` can stream any edit type."""
    import dataclasses
    import jax.numpy as jnp
    from anyedit_tpu.core.config import CanvasConfig
    from anyedit_tpu.models.gdino import TINY_GDINO
    from anyedit_tpu.models.sam import TINY_SAM
    from anyedit_tpu.models.lama import TINY_LAMA
    from anyedit_tpu.models.unet_sd import TINY_UNET, TINY_XL_UNET
    from anyedit_tpu.models.vae import TINY_VAE
    from anyedit_tpu.models.clip import TINY_TEXT, TINY_VISION
    from anyedit_tpu.models.flux import TINY_FLUX
    from anyedit_tpu.models.mmdit import TINY_MMDIT
    from anyedit_tpu.models.t5 import TINY_T5
    from anyedit_tpu.models.depth import TINY_DEPTH
    from anyedit_tpu.models.segmentation import TINY_SEG
    from anyedit_tpu.models.blip2 import TINY_QFORMER
    from anyedit_tpu.models.ocr import TINY_OCR
    from anyedit_tpu.models.vila import TINY_VILA
    from anyedit_tpu.runtime.zoo import ZooConfig

    f32 = dict(dtype=jnp.float32)
    tiny_vae = dataclasses.replace(TINY_VAE, **f32)
    text = dataclasses.replace(TINY_TEXT, vocab_size=30522, max_len=77, **f32)
    return ZooConfig(
        canvas=CanvasConfig(edit_size=64, grounding_size=64, sam_size=64,
                            latent_down=2),
        gdino=dataclasses.replace(TINY_GDINO, **f32),
        sam=dataclasses.replace(TINY_SAM, **f32),
        lama=TINY_LAMA,
        ip2p_unet=dataclasses.replace(TINY_UNET, in_channels=8, **f32),
        inpaint_unet=dataclasses.replace(TINY_UNET, in_channels=9, **f32),
        sd_unet=dataclasses.replace(TINY_UNET, **f32),
        # SDXL dual-tower context = text.hidden + text_g.hidden (32+16)
        refine_unet=dataclasses.replace(TINY_XL_UNET, context_dim=48, **f32),
        anydoor_unet=dataclasses.replace(TINY_UNET, context_dim=64, **f32),
        vae=tiny_vae, sdxl_vae=tiny_vae, sd3_vae=tiny_vae, flux_vae=tiny_vae,
        text=text,
        text_g=dataclasses.replace(TINY_TEXT, hidden=16, heads=2,
                                   vocab_size=30522, max_len=77, **f32),
        vision=dataclasses.replace(TINY_VISION, **f32),
        flux=dataclasses.replace(TINY_FLUX, context_dim=32, pooled_dim=32,
                                 **f32),
        flux_text=dataclasses.replace(TINY_T5, vocab_size=30522, **f32),
        mmdit=dataclasses.replace(TINY_MMDIT, in_channels=9, out_channels=4,
                                  context_dim=32, pooled_dim=48, max_hw=16,
                                  **f32),
        depth_cfg=dataclasses.replace(TINY_DEPTH, **f32),
        seg_cfg=TINY_SEG,
        eva=dataclasses.replace(TINY_VISION, **f32),
        qformer=TINY_QFORMER,
        ocr=TINY_OCR,
        vila=TINY_VILA,
        box_threshold=0.0)


def _add_shard_args(p):
    p.add_argument("--shard-index", type=int, default=0)
    p.add_argument("--shard-count", type=int, default=1)
    p.add_argument("--start-idx", type=int, default=None)
    p.add_argument("--end-idx", type=int, default=None)


def cmd_run(args) -> int:
    from anyedit_tpu.core.ledger import Shard
    from anyedit_tpu.core.schema import read_records
    from anyedit_tpu.runtime.executor import ExecutorConfig, FactoryExecutor
    from anyedit_tpu.runtime.zoo import ModelZoo, ZooConfig

    records = read_records(args.instruction_json)
    if args.edit_type:
        records = [r for r in records if r.edit_type == args.edit_type]
    if not records:
        print("no records to process", file=sys.stderr)
        return 1

    zoo_cfg = tiny_zoo_config() if args.tiny else ZooConfig()
    if getattr(args, "int8", False):
        import dataclasses as _dc
        zoo_cfg = _dc.replace(zoo_cfg, quant_ip2p=True,
                              quant_diffusion=True)
    if getattr(args, "lcm_steps", 0):
        import dataclasses as _dc
        zoo_cfg = _dc.replace(zoo_cfg, lcm_steps=args.lcm_steps)
    zoo = ModelZoo(zoo_cfg, weights_dir=args.weights, seed=args.seed,
                   require_weights=args.require_weights)

    from anyedit_tpu.runtime.zoo import SLOTS_FOR_EDIT_TYPE
    types = {r.edit_type for r in records}
    # the WYS-IP2P editor backs color/tone/style (+ appearance fallback)
    needs_ip2p = bool(types & {"color_alter", "tone_transfer", "style_change"})
    slots = [s for t in sorted(types) for s in SLOTS_FOR_EDIT_TYPE.get(t, ())]
    # filter-gate scorers (pre_filter.py:115-188, post_filter.py:15-79)
    slots += ["clip", "aesthetic"]
    if types & {"background_change", "color_alter"}:
        slots += ["vqa"]
    tb = zoo.toolbox(with_diffusion=needs_ip2p, slots=slots)

    image_root = Path(args.image_root)

    def load_image(rec):
        from PIL import Image
        if not rec.image_file:
            # composition / textual_change synthesize both sides — no
            # source image exists; hand the pipeline a neutral canvas
            size = zoo_cfg.canvas.edit_size
            return np.full((size, size, 3), 127, np.uint8)
        return np.asarray(Image.open(image_root / rec.image_file).convert("RGB"))

    # asset loaders for the visual / rotation families
    def load_visual(rec):
        from PIL import Image
        if rec.visual_input:
            p = image_root / rec.visual_input
            if p.exists():
                return np.asarray(Image.open(p).convert("RGB"))
        return load_image(rec)   # hermetic fallback: self-reference

    def load_rotation_pair(rec):
        """Record contract: extras['rotation'] = {frame_a, frame_b (paths),
        q1, q2 (wxyz)} — the MVImgNet capture pair + COLMAP quaternions."""
        from PIL import Image
        rot = rec.extras.get("rotation")
        if not rot:
            return None
        fa = np.asarray(Image.open(image_root / rot["frame_a"]).convert("RGB"))
        fb = np.asarray(Image.open(image_root / rot["frame_b"]).convert("RGB"))
        return fa, fb, np.asarray(rot["q1"], np.float64), \
            np.asarray(rot["q2"], np.float64)

    tb.extra.setdefault("load_visual", load_visual)
    tb.extra.setdefault("load_rotation_pair", load_rotation_pair)

    ex = FactoryExecutor(tb, ExecutorConfig(
        output_root=args.output, seed=args.seed,
        run_pre_filter=not args.no_filters,
        run_post_filter=not args.no_filters,
        profile_trace_dir=args.profile_trace,
        grounding_batch=args.ground_batch))

    shard = Shard(args.shard_index, args.shard_count, args.start_idx, args.end_idx)
    report = ex.run(records, load_image, shard=shard)
    print(json.dumps(report, indent=2))
    return 0


def _anysd_configs(tiny: bool):
    """(AnySDConfig, text_cfg, vis_cfg, vae_cfg) shared by train/edit."""
    import dataclasses
    import jax.numpy as jnp

    from anyedit_tpu.models.clip import (
        TINY_TEXT, TINY_VISION, CLIP_L_TEXT, CLIP_L_VISION)
    from anyedit_tpu.models.unet_sd import TINY_UNET, SD15_IP2P_UNET
    from anyedit_tpu.models.vae import TINY_VAE, SD_VAE
    from anyedit_tpu.train.anysd import AnySDConfig

    if tiny:
        text_cfg = dataclasses.replace(TINY_TEXT, vocab_size=49408,
                                       max_len=16, dtype=jnp.float32)
        vis_cfg = dataclasses.replace(TINY_VISION, dtype=jnp.float32)
        vae_cfg = dataclasses.replace(TINY_VAE, dtype=jnp.float32)
        unet_cfg = dataclasses.replace(
            TINY_UNET, in_channels=8, context_dim=text_cfg.hidden,
            dtype=jnp.float32)
        num_experts = 4
    else:
        text_cfg, vis_cfg, vae_cfg = CLIP_L_TEXT, CLIP_L_VISION, SD_VAE
        unet_cfg = SD15_IP2P_UNET
        num_experts = 11
    cfg = AnySDConfig(unet=unet_cfg, num_experts=num_experts,
                      image_embed_dim=vis_cfg.proj_dim)
    return cfg, text_cfg, vis_cfg, vae_cfg


def cmd_edit(args) -> int:
    """Apply a TRAINED AnySD adapter checkpoint to an image — the
    deployment surface of the L6 loop (the reference delegates this to its
    separate AnySD release; semantics are train.py:37-76 validation)."""
    import json as _json

    from PIL import Image
    from anyedit_tpu.train.inference import AnySDEditor

    cfg, text_cfg, vis_cfg, vae_cfg = _anysd_configs(args.tiny)
    editor = AnySDEditor.from_checkpoint(
        cfg, args.checkpoint_dir, weights_dir=args.weights_dir,
        require_weights=args.require_weights, seed=args.seed,
        resolution=args.resolution, allow_fallback_tokenizers=args.tiny,
        text_cfg=text_cfg, vis_cfg=vis_cfg, vae_cfg=vae_cfg)
    img = np.asarray(Image.open(args.image).convert("RGB"))
    out = editor.edit(img, args.instruction, args.edit_type,
                      steps=args.steps, text_scale=args.guidance,
                      image_scale=args.image_guidance, seed=args.seed)
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(out).save(args.output)
    print(_json.dumps({"output": str(args.output),
                       "edit_type": args.edit_type,
                       "size": list(out.shape[:2])}))
    return 0


def cmd_train(args) -> int:
    """AnySD Stage-II fine-tune from a factory success ledger — replaces
    the reference's `accelerate launch train.py` (train.py:347-800):
    mixture dataset → on-device encode → pjit MoE-adapter train step →
    Orbax checkpoint/rotate/resume."""
    import jax
    import jax.numpy as jnp

    from anyedit_tpu.core.mesh import MeshSpec, make_mesh
    from anyedit_tpu.models.vae import AutoencoderKL
    from anyedit_tpu.ops.resize import imagenet_normalize, resize_image
    from anyedit_tpu.train.anysd import AnySDTrainer, shard_tree
    from anyedit_tpu.train.checkpoint import TrainCheckpointer
    from anyedit_tpu.train.data import (
        MixtureSampler, examples_from_ledger, pixel_batches)
    from anyedit_tpu.train.frozen import load_frozen_encoders

    cfg, text_cfg, vis_cfg, vae_cfg = _anysd_configs(args.tiny)
    trainer = AnySDTrainer(cfg, learning_rate=args.lr)

    # frozen encoders (train.py:414-418 freezes VAE/text/image encoders) —
    # converted .msgpack weights when --weights-dir is given, fail-loud per
    # slot with --require-weights; random init only for hermetic runs.
    key = jax.random.key(args.seed)
    res = args.resolution
    frozen = load_frozen_encoders(
        vae_cfg, text_cfg, vis_cfg, weights_dir=args.weights_dir,
        require=args.require_weights, seed=args.seed, resolution=res,
        allow_fallback_tokenizers=args.tiny)
    vae, vae_p = frozen.vae, frozen.vae_params
    text, text_p = frozen.text, frozen.text_params
    vision, vis_p = frozen.vision, frozen.vision_params
    sf = vae_cfg.scaling_factor

    # frozen-tower params are jit ARGUMENTS (not closure constants): baked
    # constants would be read back tensor-by-tensor at lowering time and
    # re-compiled per checkpoint (core/jit.py rationale).
    @jax.jit
    def _encode_batch(vae_p, text_p, vis_p, batch):
        e_mean, _ = vae.apply(vae_p, batch["edited_px"],
                              method=AutoencoderKL.encode)
        o_mean, _ = vae.apply(vae_p, batch["orig_px"],
                              method=AutoencoderKL.encode)
        hidden, _, _ = text.apply(text_p, batch["text_ids"])
        px = resize_image(batch["orig_px"] * 0.5 + 0.5, vis_cfg.image_size,
                          vis_cfg.image_size, "bilinear")
        _, emb = vision.apply(vis_p, imagenet_normalize(px))
        return {"edited_latents": e_mean * sf, "orig_latents": o_mean * sf,
                "text_emb": hidden, "image_embed": emb,
                "task_id": batch["task_id"]}

    def encode_batch(batch):
        return _encode_batch(vae_p, text_p, vis_p, batch)

    latent_hw = res // (2 ** (len(vae_cfg.block_channels) - 1))
    unet_p, adapter_p, opt_state = trainer.init(key, latent_hw=latent_hw,
                                                text_len=text_cfg.max_len)
    if frozen.unet_params is not None:
        unet_p = frozen.unet_params   # converted IP2P UNet (stays frozen)
    # dp must divide the global batch; surplus devices go to tp/ep
    import math
    n_dev = jax.device_count()
    dp = math.gcd(args.batch_size, n_dev)
    rest = n_dev // dp
    tp = 2 if rest % 2 == 0 and rest > 1 else 1
    ep = 2 if (rest // tp) % 2 == 0 and rest // tp > 1 else 1
    spec = MeshSpec(dp=dp, tp=tp, ep=ep)
    mesh = make_mesh(spec, devices=jax.devices()[:spec.size])
    ad_spec, unet_spec, data_sh = trainer.shardings(mesh)
    adapter_p = shard_tree(adapter_p, ad_spec)
    unet_p = shard_tree(unet_p, unet_spec)
    opt_state = trainer.tx.init(adapter_p)

    ckpt = TrainCheckpointer(args.checkpoint_dir, keep=args.keep_checkpoints,
                             save_interval_steps=args.checkpoint_every)
    start_step = 0
    if args.resume:
        step0, ap, op = ckpt.restore_latest(adapter_p, opt_state)
        if step0 is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            # restored scalars come back committed to one device; replicate
            # them so they compose with the sharded params under jit
            op = jax.tree.map(
                lambda x: jax.device_put(x, repl)
                if getattr(x, "ndim", None) == 0 else x, op)
            start_step, adapter_p, opt_state = step0, ap, op
            print(f"resumed from step {start_step}")

    examples = examples_from_ledger(args.ledger, args.image_root)
    if not examples:
        print("no trainable success records in ledger", file=sys.stderr)
        return 1
    sampler = MixtureSampler(examples, seed=args.seed)
    tok = frozen.clip_tokenizer

    def tokenize(s):
        ids = tok.encode(s)[:text_cfg.max_len]
        arr = np.zeros((1, text_cfg.max_len), np.int32)
        arr[0, :len(ids)] = ids
        return arr

    # validation grids (train.py:37-76 log_validation at every checkpoint
    # interval): run the current adapter through the IP2P editor on a fixed
    # set of ledger examples, save [orig | edited] contact sheets.
    val_pairs = []
    if args.val_count > 0:
        from PIL import Image
        from anyedit_tpu.train.inference import AnySDEditor
        from anyedit_tpu.train.validation import log_validation

        for ex in examples[:args.val_count]:
            im = np.asarray(Image.open(ex.input_file).convert("RGB")
                            .resize((res, res)))
            val_pairs.append((im, ex.record.edit, ex.record.edit_type))

        editor = AnySDEditor(cfg, frozen, unet_p, resolution=res)

        def run_validation(step, adapter_p):
            path = log_validation(
                lambda im, it: editor.edit(
                    im, it[0], it[1], adapter_params=adapter_p,
                    steps=args.val_steps, seed=args.seed),
                [(im, (instr, et)) for im, instr, et in val_pairs],
                Path(args.checkpoint_dir) / "val", step)
            print(json.dumps({"validation_grid": str(path), "step": step}))

    train_step = jax.jit(trainer.train_step)
    losses = []
    last_val = -1
    bit = pixel_batches(sampler, args.batch_size, res,
                        args.steps - start_step, tokenize)
    for step, pixel in enumerate(bit, start=start_step):
        batch = encode_batch(jax.tree.map(jnp.asarray, pixel))
        batch = {k: jax.device_put(v, data_sh) for k, v in batch.items()}
        adapter_p, opt_state, loss = train_step(
            adapter_p, opt_state, unet_p, batch,
            jax.random.fold_in(key, step))
        losses.append(float(loss))
        if (step + 1) % args.log_every == 0:
            print(json.dumps({"step": step + 1, "loss": losses[-1]}))
        if (step + 1) % args.checkpoint_every == 0:
            ckpt.save(step + 1, adapter_p, opt_state)
            if val_pairs:
                run_validation(step + 1, adapter_p)
                last_val = step + 1
    ckpt.save(args.steps, adapter_p, opt_state)
    if val_pairs and last_val != args.steps:
        run_validation(args.steps, adapter_p)
    ckpt.wait()
    ckpt.close()
    print(json.dumps({"final_step": args.steps,
                      "mean_loss": float(np.mean(losses)) if losses else None,
                      "examples": len(examples),
                      "mixture_types": sorted(sampler.buckets)}))
    return 0


def cmd_distill(args) -> int:
    """LCM guidance distillation of the IP2P editor into the few-step
    student checkpoint that `run --lcm-steps` consumes
    (`unet_ip2p_lcm.msgpack`).

    This is the production entry for the fast mode: the reference's
    WYS-IP2P editor runs a 100-step 3-way-CFG DDIM loop per edit
    (adaptive_editing_pipelines/tools/global_tool.py:105-192); the
    distilled student folds that guidance into its weights
    (train/distill.py) so the factory edits in `--lcm-steps` single
    UNet passes. Data = (orig, edited, instruction) pairs from a factory
    success ledger — the same mixture pipeline the AnySD trainer eats.

    With `--eval-count N` the command also writes two eval run
    directories (<checkpoint-dir>/eval_teacher, eval_student): matched
    record sets edited by the teacher at --ddim-steps and by the student
    at --lcm-steps FROM THE SAME x_T, ready for `anyedit_tpu eval` to
    produce the CLIP/dirCLIP/L1/pass-rate quality-delta table (the
    post_filter.py:15-79 acceptance bar). An inline latent/pixel-L1
    teacher-vs-student readout prints immediately.
    """
    import jax
    import jax.numpy as jnp

    from anyedit_tpu.models.vae import AutoencoderKL
    from anyedit_tpu.schedulers import make_noise_schedule
    from anyedit_tpu.train.checkpoint import TrainCheckpointer
    from anyedit_tpu.train.data import (
        MixtureSampler, examples_from_ledger, pixel_batches)
    from anyedit_tpu.train.distill import DistillConfig, LCMDistiller
    from anyedit_tpu.train.frozen import load_frozen_encoders
    from anyedit_tpu.weights.convert import save_params

    anysd_cfg, text_cfg, vis_cfg, vae_cfg = _anysd_configs(args.tiny)
    dcfg = DistillConfig(
        unet=anysd_cfg.unet,
        num_ddim_steps=args.ddim_steps,
        skip=args.skip,
        guidance_scale=args.guidance,
        image_guidance_scale=args.image_guidance,
        ema_decay=args.ema_decay,
        learning_rate=args.lr)

    res = args.resolution
    frozen = load_frozen_encoders(
        vae_cfg, text_cfg, vis_cfg, weights_dir=args.weights_dir,
        require=args.require_weights, seed=args.seed, resolution=res,
        allow_fallback_tokenizers=args.tiny)
    vae, vae_p = frozen.vae, frozen.vae_params
    text, text_p = frozen.text, frozen.text_params
    sf = vae_cfg.scaling_factor

    ns = make_noise_schedule()
    dist = LCMDistiller(dcfg, ns)
    key = jax.random.key(args.seed)
    latent_hw = res // (2 ** (len(vae_cfg.block_channels) - 1))
    if frozen.unet_params is not None:
        teacher = frozen.unet_params          # converted IP2P checkpoint
    else:
        # hermetic tiny runs only — --require-weights raised upstream if
        # the teacher msgpack is missing
        x0 = jnp.zeros((1, latent_hw, latent_hw, dcfg.unet.in_channels),
                       jnp.float32)
        ctx0 = jnp.zeros((1, text_cfg.max_len, dcfg.unet.context_dim),
                         jnp.float32)
        teacher = jax.jit(dist.unet.init)(key, x0,
                                          jnp.zeros((1,), jnp.int32), ctx0)

    tok = frozen.clip_tokenizer

    def tokenize(s):
        ids = tok.encode(s)[:text_cfg.max_len]
        arr = np.zeros((1, text_cfg.max_len), np.int32)
        arr[0, :len(ids)] = ids
        return arr

    uncond_ids = jnp.asarray(tokenize(""))

    # frozen-tower params as jit ARGUMENTS (core/jit.py rationale)
    @jax.jit
    def encode(vae_p, text_p, batch):
        e_mean, _ = vae.apply(vae_p, batch["edited_px"],
                              method=AutoencoderKL.encode)
        o_mean, _ = vae.apply(vae_p, batch["orig_px"],
                              method=AutoencoderKL.encode)
        hidden, _, _ = text.apply(text_p, batch["text_ids"])
        u_hidden, _, _ = text.apply(text_p, uncond_ids)
        return {"edited_latents": e_mean * sf, "orig_latents": o_mean * sf,
                "text_emb": hidden,
                "uncond_emb": jnp.broadcast_to(u_hidden, hidden.shape)}

    student, ema, opt_state = dist.init(teacher)
    ckpt = TrainCheckpointer(args.checkpoint_dir, keep=args.keep_checkpoints,
                             save_interval_steps=args.checkpoint_every)
    start_step = 0
    if args.resume:
        step0, ap, op = ckpt.restore_latest(
            {"student": student, "ema": ema}, opt_state)
        if step0 is not None:
            start_step = step0
            student, ema, opt_state = ap["student"], ap["ema"], op
            print(f"resumed from step {start_step}")

    examples = examples_from_ledger(args.ledger, args.image_root)
    if not examples:
        print("no trainable success records in ledger", file=sys.stderr)
        return 1
    # hold out the eval set from training when we have examples to spare
    n_eval = min(args.eval_count, max(0, len(examples) - 1))
    train_ex = examples[n_eval:] if len(examples) > n_eval else examples
    sampler = MixtureSampler(train_ex, seed=args.seed)

    step = jax.jit(dist.distill_step)
    losses = []
    for i, pixel in enumerate(pixel_batches(
            sampler, args.batch_size, res, args.steps - start_step,
            tokenize), start=start_step):
        batch = encode(vae_p, text_p, jax.tree.map(jnp.asarray, pixel))
        student, ema, opt_state, loss = step(
            student, ema, opt_state, teacher, batch,
            jax.random.fold_in(key, i))
        losses.append(float(loss))
        if (i + 1) % args.log_every == 0:
            print(json.dumps({"step": i + 1, "loss": losses[-1]}))
        ckpt.save(i + 1, {"student": student, "ema": ema}, opt_state)
    ckpt.wait()
    ckpt.close()

    out = args.out or str(
        (Path(args.weights_dir) if args.weights_dir
         else Path(args.checkpoint_dir)) / "unet_ip2p_lcm.msgpack")
    save_params(ema, out)

    report = {"final_step": args.steps, "student_checkpoint": str(out),
              "mean_loss": float(np.mean(losses)) if losses else None,
              "examples": len(train_ex)}

    if n_eval > 0:
        report["quality"] = _distill_eval(
            args, dcfg, dist, ns, teacher, ema, vae, vae_p, text, text_p,
            sf, tokenize, uncond_ids, examples[:n_eval], res, latent_hw)
    print(json.dumps(report, indent=1))
    return 0


def _distill_eval(args, dcfg, dist, ns, teacher, ema, vae, vae_p, text,
                  text_p, sf, tokenize, uncond_ids, eval_ex, res,
                  latent_hw) -> dict:
    """Teacher-vs-student quality readout on held-out ledger pairs.

    Both editors start from the SAME pinned x_T per record (the
    consistency function approximates the teacher ODE's endpoint map, so
    seed parity is the correct comparison — tools/distill_quality.py
    protocol). Writes eval_teacher/ and eval_student/ run dirs for
    `anyedit_tpu eval` and returns the inline L1 summary."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from anyedit_tpu.core.ledger import RunLedger
    from anyedit_tpu.diffusion.ip2p import ip2p_edit
    from anyedit_tpu.models.vae import AutoencoderKL
    from anyedit_tpu.ops.resize import denormalize_to_u8
    from anyedit_tpu.train.data import _load_resized
    from anyedit_tpu.train.distill import lcm_edit

    key = jax.random.key(args.seed + 1)

    @jax.jit
    def encode_one(vae_p, text_p, orig_px, text_ids):
        o_mean, _ = vae.apply(vae_p, orig_px, method=AutoencoderKL.encode)
        hidden, _, _ = text.apply(text_p, text_ids)
        u_hidden, _, _ = text.apply(text_p, uncond_ids)
        return o_mean * sf, hidden, u_hidden

    @jax.jit
    def teacher_edit(params, img_lat, cond, uncond, x_T):
        def eps_fn(x, t, c_):
            return dist.unet.apply(params, x, t, c_)
        return ip2p_edit(eps_fn, ns, img_lat, cond, uncond,
                         jax.random.key(0), num_steps=dcfg.num_ddim_steps,
                         guidance_scale=dcfg.guidance_scale,
                         image_guidance_scale=dcfg.image_guidance_scale,
                         init_latents=x_T)

    @jax.jit
    def student_edit(params, img_lat, cond, k, x_T):
        return lcm_edit(dist.unet.apply, params, ns, dcfg, img_lat, cond,
                        k, num_steps=args.lcm_steps, x_init=x_T)

    @jax.jit
    def decode(vae_p, lat):
        return vae.apply(vae_p, (lat / sf), method=AutoencoderKL.decode)

    dirs = {}
    for name in ("eval_teacher", "eval_student"):
        d = Path(args.checkpoint_dir) / name
        (d / "edited_img").mkdir(parents=True, exist_ok=True)
        (d / "input_img").mkdir(parents=True, exist_ok=True)
        dirs[name] = (d, RunLedger(d / "ledger.jsonl"))

    lat_l1, px_l1, edit_mag = [], [], []
    for j, ex in enumerate(eval_ex):
        orig = _load_resized(ex.input_file, res)[None]
        ids = jnp.asarray(tokenize(ex.record.edit))
        img_lat, cond, uncond = encode_one(vae_p, text_p,
                                           jnp.asarray(orig), ids)
        x_T = jax.random.normal(jax.random.fold_in(key, j),
                                (1, latent_hw, latent_hw,
                                 img_lat.shape[-1]), jnp.float32)
        t_lat = teacher_edit(teacher, img_lat, cond, uncond, x_T)
        s_lat = student_edit(ema, img_lat, cond,
                             jax.random.fold_in(key, 10_000 + j), x_T)
        lat_l1.append(float(jnp.mean(jnp.abs(t_lat - s_lat))))
        t_px = decode(vae_p, t_lat)
        s_px = decode(vae_p, s_lat)
        px_l1.append(float(jnp.mean(jnp.abs(t_px - s_px))) / 2.0)
        edit_mag.append(float(jnp.mean(jnp.abs(
            t_px - jnp.asarray(orig)))) / 2.0)
        orig_u8 = np.asarray(denormalize_to_u8(jnp.asarray(orig[0])))
        for name, px in (("eval_teacher", t_px), ("eval_student", s_px)):
            d, led = dirs[name]
            stem = f"eval_{j}"
            u8 = np.asarray(denormalize_to_u8(px[0]))
            ep = d / "edited_img" / f"{stem}.png"
            ip = d / "input_img" / f"{stem}.png"
            Image.fromarray(u8).save(ep)
            Image.fromarray(orig_u8).save(ip)
            led.mark(ex.record, "success",
                     {"edited_file": str(ep), "input_file": str(ip)})
    for _, led in dirs.values():
        led.close()
    return {
        "pairs": len(eval_ex),
        "teacher_steps": dcfg.num_ddim_steps,
        "student_steps": args.lcm_steps,
        "latent_l1_teacher_vs_student": round(float(np.mean(lat_l1)), 4),
        "pixel_l1_teacher_vs_student": round(float(np.mean(px_l1)), 4),
        "pixel_l1_teacher_vs_orig": round(float(np.mean(edit_mag)), 4),
        "eval_dirs": {k: str(v[0]) for k, v in dirs.items()},
        "next": "run `anyedit_tpu eval --run-dir <dir>` on both eval dirs "
                "for the CLIP/dirCLIP/pass-rate quality-delta table",
    }


def cmd_convert(args) -> int:
    """Torch checkpoint → zoo msgpack (replaces the reference's setup.sh
    download step with an explicit conversion step)."""
    from anyedit_tpu.weights.bootstrap import REGISTRY, convert_checkpoint
    if args.list:
        for k, (hint, _) in sorted(REGISTRY.items()):
            print(f"{k:16s} ← {hint}")
        return 0
    if args.plan is not None:
        # the real-weights proof path: one script that fetches every
        # reference checkpoint (setup.sh:20-118 re-keyed by our registry)
        # and converts each with --verify where a torch reference exists
        from anyedit_tpu.weights.manifest import emit_plan
        print(emit_plan(args.plan, args.weights_dir), end="")
        return 0
    out = args.out or str(Path(args.weights_dir) / f"{args.model}.msgpack")
    convert_checkpoint(args.model, args.src, out, verify=args.verify)
    print(f"wrote {out}")
    return 0


def cmd_export(args) -> int:
    from anyedit_tpu.core.ledger import RunLedger
    led = RunLedger(args.ledger)
    led.export_reference_files(args.output, args.start or 0, args.end)
    led.close()
    print(f"exported to {args.output}")
    return 0


def cmd_eval(args) -> int:
    """Score a finished run's edited pairs (runtime/evaluate.py): CLIP /
    dirCLIP / L1 / SSIM aggregates + post-filter pass-rate per edit type
    — the reference's operational quality definition
    (filter_tool/post_filter.py:15-79) as an offline readout."""
    import json as _json

    from anyedit_tpu.runtime.evaluate import (
        default_loader, evaluate_pairs, run_dir_entries,
    )
    from anyedit_tpu.runtime.zoo import ModelZoo

    entries = run_dir_entries(args.run_dir)
    if not entries:
        print("no success entries in ledger", file=sys.stderr)
        return 1
    zoo_cfg = tiny_zoo_config() if args.tiny else ZooConfig()
    zoo = ModelZoo(zoo_cfg, weights_dir=args.weights, seed=args.seed,
                   require_weights=args.require_weights)
    # eval needs ONLY the CLIP towers — build a bare Toolbox and install
    # the clip slot rather than toolbox() (which eagerly constructs
    # GroundingDINO/SAM/LaMa the metrics never touch).
    from anyedit_tpu.edits.types import Toolbox
    tb = Toolbox(ground=None, inpaint=None)
    zoo.install(tb, "clip")
    zoo.install(tb, "dino")     # DINO subject-fidelity metric
    report = evaluate_pairs(tb, entries,
                            default_loader(args.run_dir, args.image_root))
    with open(args.output, "w") as f:
        _json.dump(report, f, indent=1)
    print(_json.dumps({"overall": report["overall"],
                       "per_type": report["per_type"]}))
    return 0


def cmd_generate(args) -> int:
    """L2 instruction generation: captions → instruction-record JSONL
    (reference CLI: edit_instruction/instruction_gen.py:98-174 — few-shot
    prompt → LLM generate → parse → self-check; rule-based types route to
    the rule generators). Backends: `template` (hermetic, deterministic)
    or `llama` (the in-repo decoder; needs converted weights + tokenizer
    assets for real language — random weights produce throughput only)."""
    import random as _random

    from anyedit_tpu.core.schema import write_records
    from anyedit_tpu.grounding.tags import generate_tags
    from anyedit_tpu.instructions.generator import (
        InstructionGenerator, LlamaBackend, TemplateBackend,
        rule_based_counting, rule_based_relation,
        rule_based_resize_movement)

    captions = [ln.strip() for ln in open(args.captions)
                if ln.strip()][:args.limit or None]
    rng = _random.Random(args.seed)

    if args.edit_type in ("counting", "resize", "movement", "relation"):
        recs = []
        for cap in captions:
            nouns = generate_tags(cap)["nouns"]
            if not nouns:
                continue
            if args.edit_type == "counting":
                recs.append(rule_based_counting(cap, nouns[0],
                                                rng.randint(2, 6), rng))
            elif args.edit_type == "relation":
                if len(nouns) >= 2:
                    recs.append(rule_based_relation(cap, nouns[0], nouns[1]))
            else:
                recs.append(rule_based_resize_movement(cap, nouns[0],
                                                       args.edit_type, rng))
    else:
        if args.backend == "llama":
            import dataclasses as _dc

            import jax.numpy as jnp

            from anyedit_tpu.models.llama import Llama, LLAMA3_8B, TINY_LLAMA
            from anyedit_tpu.runtime.zoo import load_params
            cfg = TINY_LLAMA if args.tiny else _dc.replace(
                LLAMA3_8B, quant=args.int8)
            model = Llama(cfg)
            wf = (Path(args.weights) / "llama.msgpack"
                  if args.weights else None)
            params = load_params(model, (jnp.zeros((1, 8), jnp.int32),),
                                 wf, args.seed,
                                 require=args.require_weights)
            v = cfg.vocab_size
            tokenize = lambda s: [1 + (b % (v - 2))
                                  for b in s.encode()][-1024:]
            detok = lambda ids: bytes(
                (max(0, i - 1) % 256) for i in ids).decode("utf-8",
                                                           "replace")
            llm = LlamaBackend(model, params, tokenize, detok,
                               batch_size=args.batch_size)
        else:
            llm = TemplateBackend()
        gen = InstructionGenerator(llm=llm, seed=args.seed,
                                   self_check=not args.no_self_check,
                                   n_shots=args.shots)
        recs = gen.generate(args.edit_type, captions,
                            batch_size=args.batch_size)

    write_records(args.output, recs)
    print(json.dumps({"captions": len(captions), "records": len(recs),
                      "output": args.output}))
    return 0


def cmd_bench(args) -> int:
    import bench
    bench.main()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="anyedit_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run editing pipelines over a record stream")
    pr.add_argument("--instruction-json", required=True)
    pr.add_argument("--image-root", required=True)
    pr.add_argument("--edit-type", default=None)
    pr.add_argument("--output", default="out")
    pr.add_argument("--weights", default=None,
                    help="dir of converted .msgpack checkpoints")
    pr.add_argument("--require-weights", action="store_true",
                    help="refuse to run any model slot without its "
                         "converted .msgpack (no silent random init)")
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--profile-trace", default=None,
                    help="write a jax.profiler trace here")
    pr.add_argument("--tiny", action="store_true",
                    help="tiny random-weight models (hermetic smoke runs)")
    pr.add_argument("--ground-batch", type=int, default=8,
                    help="device-batch N records' first grounding (0=off)")
    pr.add_argument("--no-filters", action="store_true",
                    help="skip pre/post gates (random-weight smoke runs)")
    pr.add_argument("--int8", action="store_true",
                    help="W8A8 int8 UNet fast mode for the IP2P editor "
                         "(ops/quant.py; ~2x MXU int8 peak on v5e)")
    pr.add_argument("--lcm-steps", type=int, default=0,
                    help="distilled few-step consistency editor for the "
                         "IP2P slot (train/distill.py; loads "
                         "unet_ip2p_lcm.msgpack when present). 0 = off; "
                         "4 is the measured 63k pairs/hr/chip mode")
    _add_shard_args(pr)
    pr.set_defaults(fn=cmd_run)

    pt = sub.add_parser("train", help="AnySD fine-tune from a success ledger")
    pt.add_argument("--ledger", required=True)
    pt.add_argument("--image-root", default=None)
    pt.add_argument("--steps", type=int, default=1000)
    pt.add_argument("--batch-size", type=int, default=16)
    pt.add_argument("--resolution", type=int, default=256)   # train.py:178
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--checkpoint-dir", default="ckpt")
    pt.add_argument("--checkpoint-every", type=int, default=500)
    pt.add_argument("--keep-checkpoints", type=int, default=3)
    pt.add_argument("--log-every", type=int, default=10)
    pt.add_argument("--resume", action="store_true")
    pt.add_argument("--tiny", action="store_true")
    pt.add_argument("--weights-dir", default=None,
                    help="dir of converted .msgpack frozen towers "
                         "(vae/clip_text/clip_vision/unet_ip2p)")
    pt.add_argument("--require-weights", action="store_true",
                    help="error out if any frozen tower has no .msgpack")
    pt.add_argument("--val-count", type=int, default=4,
                    help="validation pairs per grid (0 disables grids)")
    pt.add_argument("--val-steps", type=int, default=20,
                    help="DDIM steps for validation edits")
    pt.set_defaults(fn=cmd_train)

    pd = sub.add_parser("edit", help="edit one image with a trained AnySD "
                                     "adapter checkpoint")
    pd.add_argument("--image", required=True)
    pd.add_argument("--instruction", required=True)
    pd.add_argument("--edit-type", required=True)
    pd.add_argument("--checkpoint-dir", required=True,
                    help="Orbax dir written by `anyedit_tpu train`")
    pd.add_argument("--output", default="edited.png")
    pd.add_argument("--weights-dir", default=None,
                    help="dir of converted frozen-tower .msgpack weights")
    pd.add_argument("--require-weights", action="store_true")
    pd.add_argument("--resolution", type=int, default=256)
    pd.add_argument("--steps", type=int, default=20)
    pd.add_argument("--guidance", type=float, default=7.5)
    pd.add_argument("--image-guidance", type=float, default=1.5)
    pd.add_argument("--seed", type=int, default=0)
    pd.add_argument("--tiny", action="store_true")
    pd.set_defaults(fn=cmd_edit)

    px = sub.add_parser("distill", help="LCM-distill the IP2P editor into "
                        "the few-step student (`run --lcm-steps` consumes "
                        "the resulting unet_ip2p_lcm.msgpack)")
    px.add_argument("--ledger", required=True,
                    help="factory success ledger (training pairs)")
    px.add_argument("--image-root", default=None)
    px.add_argument("--steps", type=int, default=2000)
    px.add_argument("--batch-size", type=int, default=8)
    px.add_argument("--resolution", type=int, default=512)
    px.add_argument("--lr", type=float, default=1e-5)
    px.add_argument("--ddim-steps", type=int, default=50,
                    help="teacher ODE grid (the factory's DDIM step count)")
    px.add_argument("--skip", type=int, default=1,
                    help="grid skip k per consistency target")
    px.add_argument("--guidance", type=float, default=8.0)
    px.add_argument("--image-guidance", type=float, default=0.9)
    px.add_argument("--ema-decay", type=float, default=0.95)
    px.add_argument("--lcm-steps", type=int, default=4,
                    help="student sampling steps for the eval readout")
    px.add_argument("--eval-count", type=int, default=8,
                    help="held-out pairs for the teacher-vs-student "
                         "quality readout (0 disables)")
    px.add_argument("--seed", type=int, default=0)
    px.add_argument("--checkpoint-dir", default="distill_ckpt")
    px.add_argument("--checkpoint-every", type=int, default=500)
    px.add_argument("--keep-checkpoints", type=int, default=3)
    px.add_argument("--log-every", type=int, default=50)
    px.add_argument("--resume", action="store_true")
    px.add_argument("--tiny", action="store_true")
    px.add_argument("--weights-dir", default=None,
                    help="converted .msgpack dir (teacher unet_ip2p + "
                         "frozen vae/clip_text); the student writes here")
    px.add_argument("--require-weights", action="store_true")
    px.add_argument("--out", default=None,
                    help="student msgpack path (default "
                         "<weights-dir>/unet_ip2p_lcm.msgpack)")
    px.set_defaults(fn=cmd_distill)

    pc = sub.add_parser("convert", help="torch checkpoint → zoo msgpack")
    pc.add_argument("--model", default=None)
    pc.add_argument("--src", default=None)
    pc.add_argument("--out", default=None)
    pc.add_argument("--weights-dir", default="weights")
    pc.add_argument("--list", action="store_true")
    pc.add_argument("--plan", default=None, metavar="DOWNLOADS_DIR",
                    help="print the fetch+convert shell script for ALL "
                         "registry checkpoints (weights/manifest.py) "
                         "instead of converting one")
    pc.add_argument("--verify", action="store_true",
                    help="run the torch source model vs the converted Flax "
                         "model on a fixed input; refuse to write on "
                         "mismatch (needs an HF model dir as --src)")
    pc.set_defaults(fn=cmd_convert)

    pv = sub.add_parser("eval", help="score a run's edited pairs (CLIP/"
                                     "dirCLIP/L1/SSIM + post-filter "
                                     "pass-rate per edit type)")
    pv.add_argument("--run-dir", required=True,
                    help="a `run` output dir (ledger.jsonl + saved images)")
    pv.add_argument("--image-root", default=None,
                    help="original images (for records whose input is not "
                         "synthesized)")
    pv.add_argument("--output", default="eval.json")
    pv.add_argument("--weights", default=None)
    pv.add_argument("--require-weights", action="store_true")
    pv.add_argument("--seed", type=int, default=0)
    pv.add_argument("--tiny", action="store_true")
    pv.set_defaults(fn=cmd_eval)

    pe = sub.add_parser("export", help="ledger → reference-format JSONs")
    pe.add_argument("--ledger", required=True)
    pe.add_argument("--output", required=True)
    pe.add_argument("--start", type=int, default=0)
    pe.add_argument("--end", type=int, default=None)
    pe.set_defaults(fn=cmd_export)

    pg = sub.add_parser("generate", help="captions → instruction records "
                        "(L2 layer; template or llama backend)")
    pg.add_argument("--captions", required=True,
                    help="text file, one caption per line")
    pg.add_argument("--edit-type", required=True)
    pg.add_argument("--output", required=True, help=".jsonl or .json path")
    pg.add_argument("--backend", choices=("template", "llama"),
                    default="template")
    pg.add_argument("--weights", default=None)
    pg.add_argument("--require-weights", action="store_true")
    pg.add_argument("--tiny", action="store_true")
    pg.add_argument("--int8", action="store_true",
                    help="W8A8 llama decoder (fits 8B on one v5e chip)")
    pg.add_argument("--batch-size", type=int, default=16)
    pg.add_argument("--limit", type=int, default=0)
    pg.add_argument("--seed", type=int, default=0)
    pg.add_argument("--no-self-check", action="store_true")
    pg.add_argument("--shots", type=int, default=5,
                    help="few-shot examples per prompt (5 = reference "
                         "setting; 2 lands in a ~256-token bucket, a "
                         "3-4x prefill cut)")
    pg.set_defaults(fn=cmd_generate)

    pb = sub.add_parser("bench", help="throughput benchmark")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
