"""Frozen-tower loading for the AnySD trainer.

The reference train.py:414-418 loads and freezes the VAE, the CLIP text
encoder, and the CLIP image encoder from real checkpoints; only the
adapter trains. This module gives `cmd_train` the same contract the zoo
already has for inference: converted .msgpack weights when a weights dir
is supplied (fail-loud with --require-weights), seeded random init only
for hermetic runs; tokenizer assets selected fail-loud alongside.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax.numpy as jnp

from anyedit_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from anyedit_tpu.models.vae import AutoencoderKL
from anyedit_tpu.runtime.zoo import load_params


@dataclasses.dataclass
class FrozenEncoders:
    vae: AutoencoderKL
    vae_params: dict
    text: CLIPTextEncoder
    text_params: dict
    vision: CLIPVisionEncoder
    vision_params: dict
    clip_tokenizer: object          # .encode(str) -> list[int]
    unet_params: Optional[dict]     # converted IP2P UNet or None (random)


def load_frozen_encoders(vae_cfg, text_cfg, vis_cfg,
                         weights_dir: Optional[str | Path] = None,
                         require: bool = False, seed: int = 0,
                         resolution: int = 256,
                         allow_fallback_tokenizers: bool = False
                         ) -> FrozenEncoders:
    """Build + load the frozen towers (weight names match the zoo/convert
    registry: vae / clip_text / clip_vision / unet_ip2p .msgpack)."""
    wdir = Path(weights_dir) if weights_dir else None
    if require and wdir is None:
        raise ValueError("require_weights=True needs a weights_dir "
                         "(otherwise every frozen tower would silently "
                         "random-init)")

    def wf(name):
        return (wdir / f"{name}.msgpack") if wdir is not None else None

    vae = AutoencoderKL(vae_cfg)
    text = CLIPTextEncoder(text_cfg)
    vision = CLIPVisionEncoder(vis_cfg)
    vae_p = load_params(
        vae, (jnp.zeros((1, resolution, resolution, 3)),), wf("vae"), seed,
        require=require)
    text_p = load_params(
        text, (jnp.zeros((1, text_cfg.max_len), jnp.int32),),
        wf("clip_text"), seed, require=require)
    vis_p = load_params(
        vision, (jnp.zeros((1, vis_cfg.image_size, vis_cfg.image_size, 3)),),
        wf("clip_vision"), seed, require=require)
    unet_p = None
    unet_wf = wf("unet_ip2p")
    if unet_wf is not None and unet_wf.exists():
        from flax.serialization import msgpack_restore
        unet_p = msgpack_restore(unet_wf.read_bytes())
    elif unet_wf is not None and require:
        raise FileNotFoundError(
            f"required weights missing: {unet_wf}; convert the checkpoint "
            "first (`anyedit_tpu convert`) or drop --require-weights")

    # Only the CLIP BPE matters for training (no grounding text here);
    # fail-loud like ModelZoo when weights exist but the merges don't.
    from anyedit_tpu.models.clip_tokenizer import (
        ClipBPETokenizer, SimpleClipTokenizer, find_clip_merges)
    merges = None
    if wdir is not None:
        merges = find_clip_merges(wdir)
        if merges is None and not allow_fallback_tokenizers:
            raise FileNotFoundError(
                f"weights_dir={wdir} is set but the CLIP BPE merges are "
                "missing (bpe_simple_vocab_16e6.txt.gz); converted text-"
                "encoder weights would receive hash-bucket token ids.")
    clip_tok = (ClipBPETokenizer(merges) if merges
                else SimpleClipTokenizer(text_cfg.vocab_size))
    return FrozenEncoders(vae, vae_p, text, text_p, vision, vis_p,
                          clip_tok, unet_p)
