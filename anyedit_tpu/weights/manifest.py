"""Checkpoint manifest — the real-weights proof path.

The reference bootstraps ~25 checkpoints with `huggingface-cli download` /
`wget` (setup.sh:20-118). This module is that list re-keyed by OUR convert
registry (`weights/bootstrap.py::REGISTRY`): for every zoo slot it records
where the source checkpoint lives and which file/subdir the converter
reads, and `emit_plan()` turns it into one runnable shell script that

  1. downloads every source (networked host; HF token only for Llama-3),
  2. runs `anyedit_tpu convert --model <name> --src <path> [--verify]`
     for each — `--verify` on every family with an in-environment torch
     runtime (weights/verify.py), so a symmetric mis-mapping is caught at
     convert time, before anything reaches the factory,
  3. drops the tokenizer assets (CLIP BPE merges, BERT vocab, Llama
     tokenizer) next to the msgpacks, where the zoo requires them.

Usage (the one-command procedure of PARITY.md "real-weights proof"):
    python -m anyedit_tpu convert --plan downloads/ > fetch_convert.sh
    bash fetch_convert.sh            # networked host
then point the factory at the weights dir:
    python -m anyedit_tpu run ... --weights weights/ --require-weights
"""

from __future__ import annotations

import dataclasses
import shlex
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Source:
    """Where one convert-registry entry's torch checkpoint comes from."""
    hub: Optional[str] = None        # huggingface repo id
    include: Optional[str] = None    # subdir/file filter inside the repo
    url: Optional[str] = None        # direct wget (non-HF hosts)
    src: str = ""                    # path passed to `convert --src`,
    #                                  relative to the download root
    token: bool = False              # needs HF auth (gated repo)
    save_as: str = ""                # wget -O name (defaults from src)
    note: str = ""


# registry name → source. One download can feed several conversions
# (AnyDoor's single ckpt → 4 slots; BLIP-2's dir → eva_vit + blip2).
MANIFEST: dict[str, Source] = {
    # --- SD1.5 family (setup.sh:29-31,44-45) ---------------------------
    "unet_sd": Source(hub="runwayml/stable-diffusion-v1-5", include="unet/*",
                      src="stable-diffusion-v1-5/unet"),
    "vae": Source(hub="runwayml/stable-diffusion-v1-5", include="vae/*",
                  src="stable-diffusion-v1-5/vae"),
    "clip_text": Source(hub="openai/clip-vit-large-patch14",
                        src="clip-vit-large-patch14"),
    "unet_ip2p": Source(hub="timbrooks/instruct-pix2pix", include="unet/*",
                        src="instruct-pix2pix/unet"),
    "unet_inpaint": Source(hub="runwayml/stable-diffusion-inpainting",
                           include="unet/*",
                           src="stable-diffusion-inpainting/unet"),
    # --- SDXL (setup.sh:35-36) -----------------------------------------
    "unet_refine": Source(hub="stabilityai/stable-diffusion-xl-base-1.0",
                          include="unet/*",
                          src="stable-diffusion-xl-base-1.0/unet"),
    "clip_text_g": Source(hub="stabilityai/stable-diffusion-xl-base-1.0",
                          include="text_encoder_2/*",
                          src="stable-diffusion-xl-base-1.0/text_encoder_2"),
    # --- SD3 UltraEdit (setup.sh:50-51) --------------------------------
    "mmdit_ultraedit": Source(hub="BleachNick/SD3_UltraEdit_w_mask",
                              include="transformer/*",
                              src="SD3_UltraEdit_w_mask/transformer"),
    "clip_text_sd3": Source(hub="BleachNick/SD3_UltraEdit_w_mask",
                            include="text_encoder/*",
                            src="SD3_UltraEdit_w_mask/text_encoder"),
    "t5": Source(hub="BleachNick/SD3_UltraEdit_w_mask",
                 include="text_encoder_3/*",
                 src="SD3_UltraEdit_w_mask/text_encoder_3"),
    # --- Flux (setup.sh:53-54) ------------------------------------------
    "flux": Source(hub="black-forest-labs/FLUX.1-schnell",
                   include="transformer/*",
                   src="FLUX.1-schnell/transformer"),
    # --- grounding + masks (setup.sh:26,56-58) ---------------------------
    "sam": Source(
        url="https://dl.fbaipublicfiles.com/segment_anything/sam_vit_h_4b8939.pth",
        src="sam_vit_h_4b8939.pth"),
    "gdino": Source(hub="ShilongLiu/GroundingDINO",
                    include="groundingdino_swinb_cogcoor.pth",
                    src="GroundingDINO/groundingdino_swinb_cogcoor.pth"),
    "lama": Source(
        url="https://huggingface.co/smartywu/big-lama/resolve/main/big-lama.zip",
        src="big-lama/models/best.ckpt", save_as="big-lama.zip",
        note="unzip big-lama.zip after download"),
    # --- condition extractors (setup.sh:63-79) ---------------------------
    "hed": Source(hub="lllyasviel/Annotators", include="ControlNetHED.pth",
                  src="Annotators/ControlNetHED.pth"),
    "depth": Source(hub="depth-anything/Depth-Anything-V2-Large",
                    include="depth_anything_v2_vitl.pth",
                    src="Depth-Anything-V2-Large/depth_anything_v2_vitl.pth"),
    "seg": Source(hub="openmmlab/upernet-swin-tiny",
                  src="upernet-swin-tiny"),
    "dinov2": Source(hub="facebook/dinov2-large", src="dinov2-large"),
    # --- AnyDoor: ONE ckpt feeds four slots (setup.sh:66-70) -------------
    "unet_anydoor": Source(
        url=("https://huggingface.co/spaces/xichenhku/AnyDoor/resolve/"
             "main/epoch%3D1-step%3D8687.ckpt"),
        src="anydoor.ckpt"),
    "controlnet_anydoor": Source(src="anydoor.ckpt",
                                 note="same download as unet_anydoor"),
    "anydoor_proj": Source(src="anydoor.ckpt",
                           note="same download as unet_anydoor"),
    "vae_anydoor": Source(src="anydoor.ckpt",
                          note="same download as unet_anydoor"),
    "dinov2_g": Source(
        url=("https://dl.fbaipublicfiles.com/dinov2/dinov2_vitg14/"
             "dinov2_vitg14_pretrain.pth"),
        src="dinov2_vitg14_pretrain.pth"),
    # --- IP-Adapter (setup.sh:60-61): one .bin, two slots ----------------
    "ip_proj": Source(hub="h94/IP-Adapter",
                      include="sdxl_models/ip-adapter_sdxl.bin",
                      src="IP-Adapter/sdxl_models/ip-adapter_sdxl.bin"),
    "ip_adapter": Source(src="IP-Adapter/sdxl_models/ip-adapter_sdxl.bin",
                         note="same download as ip_proj"),
    # --- filter scorers (setup.sh:82-87, pre_filter.py:83) ---------------
    "clip_vision": Source(hub="openai/clip-vit-large-patch14",
                          src="clip-vit-large-patch14",
                          note="same download as clip_text"),
    "clip_text_proj": Source(hub="openai/clip-vit-base-patch32",
                             src="clip-vit-base-patch32",
                             note="directional-CLIP tower (utils.py:280)"),
    "aesthetic": Source(
        url=("https://github.com/christophschuhmann/"
             "improved-aesthetic-predictor/raw/main/"
             "sac%2Blogos%2Bava1-l14-linearMSE.pth"),
        src="sac+logos+ava1-l14-linearMSE.pth"),
    "eva_vit": Source(hub="Salesforce/blip2-flan-t5-xl",
                      src="blip2-flan-t5-xl"),
    "blip2": Source(src="blip2-flan-t5-xl",
                    note="same download as eva_vit"),
    "ocr": Source(hub="stepfun-ai/GOT-OCR-2.0-hf", src="GOT-OCR-2.0-hf"),
    "vila": Source(hub="llava-hf/llava-1.5-7b-hf", src="llava-1.5-7b-hf",
                   note="VQA pre-filter tower (reference: VILA-1.5)"),
    # --- L2 instruction LLM (setup.sh:90-91, gated) -----------------------
    "llama": Source(hub="meta-llama/Meta-Llama-3-8B-Instruct",
                    src="Meta-Llama-3-8B-Instruct", token=True),
}

# non-msgpack assets the zoo/tokenizers require next to the weights
ASSETS: dict[str, Source] = {
    "bpe_simple_vocab_16e6.txt.gz": Source(
        url=("https://github.com/openai/CLIP/raw/main/clip/"
             "bpe_simple_vocab_16e6.txt.gz"),
        note="CLIP BPE merges (models/clip_tokenizer.py)"),
    "vocab.txt": Source(hub="bert-base-uncased", include="vocab.txt",
                        src="bert-base-uncased/vocab.txt",
                        note="BERT WordPiece vocab (GDINO text tower)"),
    "tokenizer.json": Source(hub="meta-llama/Meta-Llama-3-8B-Instruct",
                             include="tokenizer.json", token=True,
                             src="Meta-Llama-3-8B-Instruct/tokenizer.json",
                             note="Llama-3 tokenizer (L2 generation)"),
}


def emit_plan(downloads: str = "downloads", weights: str = "weights") -> str:
    """Shell script: fetch every source once, convert every registry slot,
    copy tokenizer assets. Verification runs wherever weights/verify.py
    has a torch reference (the operator sees `verify <name>: max abs err`
    per tower before anything is written)."""
    from anyedit_tpu.weights.bootstrap import REGISTRY
    from anyedit_tpu.weights.verify import VERIFIERS

    dl, w = shlex.quote(downloads), shlex.quote(weights)
    lines = [
        "#!/bin/sh",
        "# generated by `anyedit_tpu convert --plan` — run on a networked",
        "# host; reruns are incremental (hf + wget both skip completed",
        "# downloads, convert overwrites).",
        "set -ex",
        f"mkdir -p {dl} {w}",
    ]
    seen: set[str] = set()
    for name, s in {**MANIFEST, **ASSETS}.items():
        if s.hub and s.hub not in seen:
            seen.add(s.hub)
            tok = " --token \"$HF_TOKEN\"" if s.token else ""
            inc = f" --include {shlex.quote(s.include)}" if s.include else ""
            dest = shlex.quote(f"{downloads}/{s.hub.split('/')[-1]}")
            lines.append(f"huggingface-cli download {s.hub}{inc}"
                         f" --local-dir {dest}{tok}")
        elif s.url and s.url not in seen:
            seen.add(s.url)
            fname = s.save_as or s.src.split("/")[0] or name
            out = shlex.quote(f"{downloads}/{fname}")
            lines.append(f"wget -c {shlex.quote(s.url)} -O {out}")
            if s.note.startswith("unzip"):
                lines.append(f"unzip -o {out} -d {dl}")
    lines.append("")
    for name, s in MANIFEST.items():
        if not s.src:
            continue   # alias rows document shared downloads only
        verify = " --verify" if name in VERIFIERS else ""
        lines.append(
            f"python -m anyedit_tpu convert --model {name} "
            f"--src {shlex.quote(f'{downloads}/{s.src}')} "
            f"--out {shlex.quote(f'{weights}/{name}.msgpack')}{verify}")
    lines.append("")
    for asset, s in ASSETS.items():
        src = f"{downloads}/{s.src}" if s.src else f"{downloads}/{asset}"
        lines.append(f"cp {shlex.quote(src)} "
                     f"{shlex.quote(f'{weights}/{asset}')}")
    lines.append("echo 'weights ready: run with --weights "
                 f"{weights} --require-weights'")
    return "\n".join(lines) + "\n"
