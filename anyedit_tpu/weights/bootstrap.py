"""Checkpoint bootstrap registry — `anyedit_tpu convert` maps the
reference's downloaded torch checkpoints (setup.sh's ~25 `huggingface-cli
download`/wget entries) onto the zoo's msgpack files.

Each entry builds an ABSTRACT param tree via `jax.eval_shape` (no weights
materialize — the converters only read leaf shapes) and returns the
converted numpy tree ready for `save_params`. Output names match
`runtime/zoo.py::ModelZoo._wf` so a converted weights dir is immediately
loadable."""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp

from anyedit_tpu.weights import convert as C


def _abstract(model, *args):
    return jax.eval_shape(model.init, jax.random.key(0), *args)["params"]


def _unet(cfg_name: str):
    from anyedit_tpu.models import unet_sd

    cfg = getattr(unet_sd, cfg_name)

    def build(src: Mapping[str, Any]):
        m = unet_sd.UNet2DCondition(cfg)
        x = jnp.zeros((1, 8, 8, cfg.in_channels), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 77, cfg.context_dim), jnp.float32)
        tree = _abstract(m, x, t, ctx)
        return C.convert_unet_sd(tree, src, n_levels=len(cfg.block_channels))
    return build


def _unet_refine(src):
    from anyedit_tpu.models import unet_sd
    cfg = unet_sd.SDXL_UNET
    m = unet_sd.UNet2DCondition(cfg)
    x = jnp.zeros((1, 8, 8, cfg.in_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, cfg.context_dim), jnp.float32)
    pooled = jnp.zeros((1, cfg.addition_embed_dim), jnp.float32)
    tids = jnp.zeros((1, cfg.addition_time_dim), jnp.float32)
    tree = jax.eval_shape(m.init, jax.random.key(0), x, t, ctx,
                          pooled_text=pooled, time_ids=tids)["params"]
    return C.convert_unet_sdxl(tree, src, n_levels=len(cfg.block_channels))


def _vae(src):
    from anyedit_tpu.models.vae import AutoencoderKL, SD_VAE
    m = AutoencoderKL(SD_VAE)
    tree = _abstract(m, jnp.zeros((1, 64, 64, 3), jnp.float32))
    return C.convert_vae(tree, src, n_levels=len(SD_VAE.block_channels))


def _clip_text(cfg_name: str, text_proj: int = 0):
    from anyedit_tpu.models import clip

    def build(src):
        import dataclasses as dc
        cfg = getattr(clip, cfg_name)
        if text_proj:
            cfg = dc.replace(cfg, text_proj=text_proj)
        m = clip.CLIPTextEncoder(cfg)
        tree = _abstract(m, jnp.zeros((1, 77), jnp.int32))
        return C.convert_clip_text(tree, src)
    return build


def _clip_text_proj(src):
    """CLIPTextModel (tower + projection) from HF
    CLIPTextModelWithProjection: encoder nested + text_projection."""
    from anyedit_tpu.models.clip import CLIPTextModel, CLIP_L_TEXT
    m = CLIPTextModel(CLIP_L_TEXT)
    tree = _abstract(m, jnp.zeros((1, 77), jnp.int32))

    def key_fn(path):
        p = [q for q in path if q != "params"]
        if p[0] == "encoder":
            return C._clip_text_key(tuple(p[1:]))
        if p[0] == "text_proj":
            return "text_projection.weight", C.t_linear
        raise KeyError(f"unmapped CLIPTextModel param {'/'.join(p)}")
    return C._convert(tree, key_fn, src)


def _clip_vision(src):
    from anyedit_tpu.models.clip import CLIPVisionEncoder, CLIP_L_VISION
    m = CLIPVisionEncoder(CLIP_L_VISION)
    s = CLIP_L_VISION.image_size
    tree = _abstract(m, jnp.zeros((1, s, s, 3), jnp.float32))
    return C.convert_clip_vision(tree, src)


def _t5(src):
    from anyedit_tpu.models.t5 import T5Encoder, T5_XXL
    m = T5Encoder(T5_XXL)
    tree = _abstract(m, jnp.zeros((1, 77), jnp.int32))
    return C.convert_t5_encoder(tree, src)


def _llama(src):
    from anyedit_tpu.models.llama import Llama, LLAMA3_8B
    m = Llama(LLAMA3_8B)
    tree = _abstract(m, jnp.zeros((1, 8), jnp.int32))
    return C.convert_llama(tree, src)


def _clip_text_g(src):
    from anyedit_tpu.models.clip import CLIPTextEncoder, CLIP_BIGG_TEXT
    m = CLIPTextEncoder(CLIP_BIGG_TEXT)
    tree = _abstract(m, jnp.zeros((1, 77), jnp.int32))
    return C.convert_clip_text(tree, src)


def _sam(src):
    import numpy as np
    from anyedit_tpu.models.sam import SAM, SAM_VIT_H
    from anyedit_tpu.grounding.maskgen import MAX_BOXES
    m = SAM(SAM_VIT_H)
    px = jnp.zeros((1, SAM_VIT_H.img_size, SAM_VIT_H.img_size, 3), jnp.float32)
    bx = jnp.zeros((1, MAX_BOXES, 4), jnp.float32)
    tree = _abstract(m, px, bx)
    src = dict(src)
    # HF mirror (facebook/sam-vit-huge) ships `vision_encoder.*` naming;
    # rename to the original checkpoint layout the converter consumes —
    # SAME path `--verify` exercises, so the gate gates what is written.
    if any(k.startswith("vision_encoder.") for k in src):
        src = C.hf_sam_to_original(src)
    if "prompt_encoder.box_corner_embeddings" not in src:
        src["prompt_encoder.box_corner_embeddings"] = np.stack(
            [np.asarray(src["prompt_encoder.point_embeddings.2.weight"])[0],
             np.asarray(src["prompt_encoder.point_embeddings.3.weight"])[0]])
    return C.convert_sam(tree, src)


def _gdino(src):
    from anyedit_tpu.models.gdino import GroundingDINO, GDINO_SWINB
    m = GroundingDINO(GDINO_SWINB)
    cfg = GDINO_SWINB
    px = jnp.zeros((1, 800, 800, 3), jnp.float32)
    ids = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    msk = jnp.ones((1, cfg.max_text_len), bool)
    tree = _abstract(m, px, ids, msk)
    # HF mirror (IDEA-Research/grounding-dino-*) nests everything under
    # `model.*` — route to the HF converter, same as `--verify` does.
    if any(k.startswith("model.") for k in src):
        return C.convert_gdino_hf(tree, src)
    return C.convert_gdino(tree, src)


def _lama(src):
    from anyedit_tpu.models.lama import LamaGenerator, BIG_LAMA
    m = LamaGenerator(BIG_LAMA)
    tree = _abstract(m, jnp.zeros((1, 64, 64, 3), jnp.float32),
                     jnp.zeros((1, 64, 64, 1), jnp.float32))
    return C.convert_lama(tree, src, n_down=BIG_LAMA.n_downsample,
                          n_blocks=BIG_LAMA.n_blocks)


def _dinov2(src):
    from anyedit_tpu.models.dinov2 import DinoV2, DINOV2_L
    m = DinoV2(DINOV2_L)
    s_ = DINOV2_L.img_size
    tree = _abstract(m, jnp.zeros((1, s_, s_, 3), jnp.float32))
    return C.convert_dinov2(tree, src)


def _depth(src):
    from anyedit_tpu.models.depth import DepthAnythingV2, DEPTH_ANYTHING_L
    m = DepthAnythingV2(DEPTH_ANYTHING_L)
    s_ = DEPTH_ANYTHING_L.backbone.img_size
    tree = _abstract(m, jnp.zeros((1, s_, s_, 3), jnp.float32))
    # HF mirror (depth-anything/...-hf) uses backbone./neck./head. naming;
    # rename to the official DA-V2 layout — same path `--verify` exercises.
    if any(k.startswith("backbone.") for k in src):
        src = C.hf_depth_to_official(src,
                                     DEPTH_ANYTHING_L.backbone.depth)
    return C.convert_depth_anything(tree, src)


def _hed(src):
    from anyedit_tpu.models.hed import HED
    m = HED()
    tree = _abstract(m, jnp.zeros((1, 64, 64, 3), jnp.float32))
    return C.convert_hed(tree, src)


def _dinov2_g(src):
    """AnyDoor's conditioner: torch-hub dinov2_vitg14 at 224px (257 tokens)."""
    import dataclasses
    from anyedit_tpu.models.dinov2 import DinoV2, DINOV2_G
    cfg = dataclasses.replace(DINOV2_G, img_size=224)
    m = DinoV2(cfg)
    tree = _abstract(m, jnp.zeros((1, 224, 224, 3), jnp.float32))
    return C.convert_dinov2_hub(tree, src)


def _anydoor_unet(src):
    """ControlledUnetModel out of the single AnyDoor ControlLDM ckpt."""
    from anyedit_tpu.models.unet_sd import SD21_ANYDOOR_UNET, UNet2DCondition
    cfg = SD21_ANYDOOR_UNET
    m = UNet2DCondition(cfg)
    x = jnp.zeros((1, 8, 8, cfg.in_channels), jnp.float32)
    tree = _abstract(m, x, jnp.zeros((1,), jnp.int32),
                     jnp.zeros((1, 257, cfg.context_dim), jnp.float32))
    return C.convert_ldm_unet(tree, src, n_levels=len(cfg.block_channels),
                              lpb=cfg.layers_per_block,
                              attn_levels=cfg.attn_levels)


def _anydoor_controlnet(src):
    from anyedit_tpu.models.controlnet import ControlNet
    from anyedit_tpu.models.unet_sd import SD21_ANYDOOR_UNET
    cfg = SD21_ANYDOOR_UNET
    m = ControlNet(cfg)
    x = jnp.zeros((1, 8, 8, cfg.in_channels), jnp.float32)
    hint = jnp.zeros((1, 64, 64, 4), jnp.float32)
    tree = _abstract(m, x, jnp.zeros((1,), jnp.int32),
                     jnp.zeros((1, 257, cfg.context_dim), jnp.float32), hint)
    return C.convert_controlnet_anydoor(
        tree, src, n_levels=len(cfg.block_channels),
        lpb=cfg.layers_per_block, attn_levels=cfg.attn_levels)


def _anydoor_proj(src):
    from flax import linen as nn
    from anyedit_tpu.models.unet_sd import SD21_ANYDOOR_UNET
    from anyedit_tpu.models.dinov2 import DINOV2_G

    class _Proj(nn.Module):
        @nn.compact
        def __call__(self, e):
            return nn.Dense(SD21_ANYDOOR_UNET.context_dim,
                            dtype=jnp.float32)(e)

    tree = _abstract(_Proj(), jnp.zeros((1, 257, DINOV2_G.dim), jnp.float32))
    return C.convert_anydoor_projector(tree, src)


def _anydoor_vae(src):
    """first_stage_model (ldm AutoencoderKL naming) from the AnyDoor ckpt."""
    from anyedit_tpu.models.vae import AutoencoderKL, SD_VAE
    m = AutoencoderKL(SD_VAE)
    tree = _abstract(m, jnp.zeros((1, 64, 64, 3), jnp.float32))
    return C.convert_vae_ldm(tree, src)


def _mmdit_ultraedit(src):
    """UltraEdit SD3 transformer (SD3Transformer2DModel, in_channels 33)."""
    from anyedit_tpu.models.mmdit import MMDiT, SD3_ULTRAEDIT
    cfg = SD3_ULTRAEDIT
    m = MMDiT(cfg)
    x = jnp.zeros((1, 16, 16, cfg.in_channels), jnp.float32)
    tree = _abstract(m, x, jnp.zeros((1,), jnp.float32),
                     jnp.zeros((1, 77, cfg.context_dim), jnp.float32),
                     jnp.zeros((1, cfg.pooled_dim), jnp.float32))
    return C.convert_mmdit(tree, src)


def _flux(src):
    from anyedit_tpu.models.flux import Flux, FLUX_SCHNELL
    cfg = FLUX_SCHNELL
    m = Flux(cfg)
    x = jnp.zeros((1, 16, 16, cfg.in_channels), jnp.float32)
    tree = _abstract(m, x, jnp.zeros((1,), jnp.float32),
                     jnp.zeros((1, 77, cfg.context_dim), jnp.float32),
                     jnp.zeros((1, cfg.pooled_dim), jnp.float32))
    return C.convert_flux(tree, src)


def _ip_proj(src):
    """IP-Adapter-XL image projection (ip-adapter_sdxl.bin image_proj)."""
    from anyedit_tpu.runtime.zoo import ZooConfig
    from anyedit_tpu.models.ip_adapter import ImageProjection
    c = ZooConfig()
    m = ImageProjection(num_tokens=4, context_dim=c.refine_unet.context_dim)
    tree = _abstract(m, jnp.zeros((1, c.vision.proj_dim), jnp.float32))
    return C.convert_image_projection(tree, src)


def _ip_adapter(src):
    """IP-Adapter-XL per-site decoupled K/V (ip-adapter_sdxl.bin ip_adapter)."""
    from anyedit_tpu.runtime.zoo import ZooConfig
    from anyedit_tpu.models.ip_adapter import (IPAdapterWeights,
                                               cross_attn_sites)
    c = ZooConfig()
    names, dims = cross_attn_sites(c.refine_unet)
    m = IPAdapterWeights(names, dims, c.refine_unet.context_dim)
    tree = _abstract(
        m, jnp.zeros((1, 4, c.refine_unet.context_dim), jnp.float32))
    return C.convert_ip_adapter_weights(tree, src, names)


def _eva_vit(src):
    """BLIP-2's frozen EVA ViT-g tower (vision_model.* of the blip2 ckpt)."""
    from anyedit_tpu.models.clip import CLIPVisionEncoder, EVA_VIT_G
    m = CLIPVisionEncoder(EVA_VIT_G)
    s = EVA_VIT_G.image_size
    tree = _abstract(m, jnp.zeros((1, s, s, 3), jnp.float32))
    return C.convert_eva_vit(tree, src)


def _blip2(src):
    """Q-Former + flan-T5 LM out of Blip2ForConditionalGeneration."""
    from anyedit_tpu.models.blip2 import Blip2VQA, BLIP2_QFORMER
    c = BLIP2_QFORMER
    m = Blip2VQA(c)
    n_tok = (224 // 14) ** 2 + 1
    it = jnp.zeros((1, n_tok, c.image_dim), jnp.float32)
    qi = jnp.zeros((1, 32), jnp.int32)
    qm = jnp.ones((1, 32), bool)
    tree = _abstract(m, it, qi, qm)
    return C.convert_blip2(tree, src)


def _aesthetic(src):
    from anyedit_tpu.filters.scorers import AestheticMLP
    m = AestheticMLP()
    tree = _abstract(m, jnp.zeros((1, 768), jnp.float32))
    return C.convert_aesthetic(tree, src)


def _vila(src):
    from anyedit_tpu.models.vila import VilaVQA, VILA_1_5
    m = VilaVQA(VILA_1_5)
    s = VILA_1_5.vision.image_size
    tree = _abstract(m, jnp.zeros((1, s, s, 3), jnp.float32),
                     jnp.zeros((1, 8), jnp.int32))
    return C.convert_vila(tree, src)


def _got_ocr(src):
    from anyedit_tpu.models.ocr import GotOCR, GOT_OCR
    m = GotOCR(GOT_OCR)
    s = GOT_OCR.vision.img_size
    tree = _abstract(m, jnp.zeros((1, s, s, 3), jnp.float32),
                     jnp.zeros((1, 8), jnp.int32))
    return C.convert_got_ocr(tree, src)


def _seg(src):
    from anyedit_tpu.models.segmentation import (UperNetSegmenter,
                                                 UPERNET_SWIN_T)
    m = UperNetSegmenter(UPERNET_SWIN_T)
    tree = _abstract(m, jnp.zeros((1, 512, 512, 3), jnp.float32))
    return C.convert_upernet_swin(tree, src)


# output name (zoo._wf) → (source hint, builder)
REGISTRY: dict[str, tuple[str, Callable]] = {
    "unet_sd": ("runwayml/stable-diffusion-v1-5 unet", _unet("SD15_UNET")),
    "unet_ip2p": ("timbrooks/instruct-pix2pix unet", _unet("SD15_IP2P_UNET")),
    "unet_inpaint": ("runwayml/sd-inpainting unet", _unet("SD15_INPAINT_UNET")),
    "unet_refine": ("stabilityai/sdxl-base unet", _unet_refine),
    "vae": ("SD1.5 vae", _vae),
    "clip_text": ("openai/clip-vit-large-patch14 text", _clip_text("CLIP_L_TEXT")),
    "clip_text_sd3": ("SD3 CLIP-L text w/ projection (text_encoder/)",
                      _clip_text("CLIP_L_TEXT", text_proj=768)),
    "clip_text_g": ("laion CLIP-bigG text (SDXL tower 2)", _clip_text_g),
    "t5": ("T5-XXL v1.1 encoder (Flux/SD3)", _t5),
    "llama": ("Llama-3-8B-Instruct", _llama),
    "clip_text_proj": ("CLIPTextModelWithProjection", _clip_text_proj),
    "clip_vision": ("CLIPVisionModelWithProjection", _clip_vision),
    "sam": ("sam_vit_h_4b8939.pth", _sam),
    "gdino": ("groundingdino_swinb_cogcoor.pth", _gdino),
    "lama": ("big-lama best.ckpt (generator.*)", _lama),
    "dinov2": ("facebook/dinov2-large (HF)", _dinov2),
    "hed": ("lllyasviel ControlNetHED.pth", _hed),
    "depth": ("depth_anything_v2_vitl.pth", _depth),
    "aesthetic": ("sac+logos+ava1-l14-linearMSE.pth", _aesthetic),
    "seg": ("openmmlab/upernet-swin-tiny (HF, ADE20K)", _seg),
    "ocr": ("stepfun-ai/GOT-OCR-2.0-hf (full model)", _got_ocr),
    "vila": ("llava-hf/llava-1.5-7b-hf (full model)", _vila),
    # AnyDoor: the four pieces of the one ControlLDM checkpoint
    # (epoch=1-step=8687.ckpt) + the hub DINOv2 ViT-g conditioner
    "unet_anydoor": ("anydoor ckpt (model.diffusion_model.*)", _anydoor_unet),
    "controlnet_anydoor": ("anydoor ckpt (control_model.*)",
                           _anydoor_controlnet),
    "anydoor_proj": ("anydoor ckpt (cond_stage_model.projector.*)",
                     _anydoor_proj),
    "vae_anydoor": ("anydoor ckpt (first_stage_model.*)", _anydoor_vae),
    "dinov2_g": ("dinov2_vitg14_pretrain.pth (torch hub)", _dinov2_g),
    "mmdit_ultraedit": ("BleachNick/SD3-UltraEdit-w-mask transformer",
                        _mmdit_ultraedit),
    "flux": ("black-forest-labs/FLUX.1-schnell transformer", _flux),
    "ip_proj": ("h94/IP-Adapter sdxl .bin (image_proj group)", _ip_proj),
    "ip_adapter": ("h94/IP-Adapter sdxl .bin (ip_adapter group)", _ip_adapter),
    "eva_vit": ("Salesforce/blip2-flan-t5-xl (vision_model.*)", _eva_vit),
    "blip2": ("Salesforce/blip2-flan-t5-xl (qformer + language_model)",
              _blip2),
}


def convert_checkpoint(name: str, src_path: str, out_path: str,
                       verify: bool = False) -> None:
    if name not in REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(REGISTRY)}")
    if verify:
        # Run the SOURCE torch module vs the converted Flax module on a
        # fixed input BEFORE writing anything (weights/verify.py); raises
        # on parity failure or unsupported family.
        from anyedit_tpu.weights.verify import verify_conversion
        err = verify_conversion(name, src_path)
        print(f"verify {name}: max abs err {err:.3e} (parity OK)")
    src = C.load_torch_state(src_path)
    tree = REGISTRY[name][1](src)
    C.save_params(tree, out_path)
