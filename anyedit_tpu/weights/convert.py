"""Checkpoint converters: HF/diffusers torch weights → our Flax pytrees.

The reference downloads ~25 torch checkpoints in setup.sh; this module maps
them onto the TPU-native modules. Conventions:
  * torch Conv (O,I,kH,kW) → flax (kH,kW,I,O); Linear (O,I) → (I,O);
    norm weight/bias → scale/bias,
  * key names follow diffusers' SD1.x layout (UNet2DConditionModel /
    AutoencoderKL) and HF CLIPTextModel; each converter walks OUR param
    tree and derives the source key, so coverage is exact by construction
    (a missing source key raises with the full name).

Converted trees serialize with flax msgpack (`save_params`), the format
`runtime/zoo.py::load_params` consumes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Mapping

import jax
import numpy as np


# ---- tensor transforms ---------------------------------------------------

def t_conv(w):    # (O,I,H,W) -> (H,W,I,O)
    return np.transpose(w, (2, 3, 1, 0))


def t_linear(w):  # (O,I) -> (I,O)
    return np.transpose(w)


def t_id(w):
    return np.asarray(w)


# ---- generic walker ------------------------------------------------------

def _convert(tree, key_fn: Callable[[tuple[str, ...]], tuple[str, Callable]],
             src: Mapping[str, Any]):
    """Walk our param tree; fill each leaf from src[key] via the transform."""

    def fill(jax_path, leaf):
        path = tuple(p.key for p in jax_path)
        hf_key, tf = key_fn(path)
        if hf_key not in src:
            raise KeyError(f"missing source tensor {hf_key!r} for "
                           f"{'/'.join(path)}")
        w = tf(src[hf_key])
        if tuple(w.shape) != tuple(leaf.shape):
            raise ValueError(f"{hf_key}: shape {w.shape} vs ours {leaf.shape}")
        return np.asarray(w, dtype=np.float32)

    return jax.tree_util.tree_map_with_path(fill, tree)


# ---- SD UNet -------------------------------------------------------------

def _unet_key(path: tuple[str, ...], n_levels: int) -> tuple[str, Callable]:
    """Map our unet_sd param path → diffusers UNet2DConditionModel key."""
    p = list(path)
    if p[0] == "params":
        p = p[1:]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]

    def conv(k):
        return k + "." + suff, (t_conv if leaf == "kernel" else t_id)

    def lin(k):
        return k + "." + suff, (t_linear if leaf == "kernel" else t_id)

    def norm(k):
        return k + "." + suff, t_id

    if name == "conv_in":
        return conv("conv_in")
    if name == "conv_out":
        return conv("conv_out")
    if name == "norm_out":
        return norm("conv_norm_out")
    if name == "time_fc1":
        return lin("time_embedding.linear_1")
    if name == "time_fc2":
        return lin("time_embedding.linear_2")
    if name == "add_fc1":
        return lin("add_embedding.linear_1")
    if name == "add_fc2":
        return lin("add_embedding.linear_2")

    def res_key(base, sub):
        m = {"norm1": norm(f"{base}.norm1"), "conv1": conv(f"{base}.conv1"),
             "time_emb_proj": lin(f"{base}.time_emb_proj"),
             "norm2": norm(f"{base}.norm2"), "conv2": conv(f"{base}.conv2"),
             "skip": conv(f"{base}.conv_shortcut")}
        return m[sub]

    def tf_key(base, p):
        sub = p[1]
        if sub == "norm":
            return norm(f"{base}.norm")
        if sub == "proj_in":
            return conv(f"{base}.proj_in")
        if sub == "proj_out":
            return conv(f"{base}.proj_out")
        # block_{d}
        d = sub.split("_")[1]
        tb = f"{base}.transformer_blocks.{d}"
        s2 = p[2]
        if s2 in ("norm1", "norm2", "norm3"):
            return norm(f"{tb}.{s2}")
        if s2 in ("attn1", "attn2"):
            s3 = p[3]
            if s3 == "to_out":
                return lin(f"{tb}.{s2}.to_out.0")
            return lin(f"{tb}.{s2}.{s3}")
        if s2 == "ff":
            s3 = p[3]
            if s3 == "GEGLU_0":
                return lin(f"{tb}.ff.net.0.proj")
            return lin(f"{tb}.ff.net.2")
        raise KeyError(path)

    import re
    m = re.match(r"down_(\d+)_res_(\d+)$", name)
    if m:
        return res_key(f"down_blocks.{m[1]}.resnets.{m[2]}", p[1])
    m = re.match(r"down_(\d+)_tf_(\d+)$", name)
    if m:
        return tf_key(f"down_blocks.{m[1]}.attentions.{m[2]}", p)
    m = re.match(r"down_(\d+)_ds$", name)
    if m:
        return conv(f"down_blocks.{m[1]}.downsamplers.0.conv")
    m = re.match(r"mid_res_(\d+)$", name)
    if m:
        return res_key(f"mid_block.resnets.{m[1]}", p[1])
    if name == "mid_tf":
        return tf_key("mid_block.attentions.0", p)
    m = re.match(r"up_(\d+)_res_(\d+)$", name)
    if m:
        lvl = n_levels - 1 - int(m[1])   # our up_{lvl} ↔ diffusers reversed
        return res_key(f"up_blocks.{lvl}.resnets.{m[2]}", p[1])
    m = re.match(r"up_(\d+)_tf_(\d+)$", name)
    if m:
        lvl = n_levels - 1 - int(m[1])
        return tf_key(f"up_blocks.{lvl}.attentions.{m[2]}", p)
    m = re.match(r"up_(\d+)_us$", name)
    if m:
        lvl = n_levels - 1 - int(m[1])
        return conv(f"up_blocks.{lvl}.upsamplers.0.conv")
    raise KeyError(f"unmapped UNet param {'/'.join(path)}")


def convert_unet_sd(our_tree, hf_state: Mapping[str, Any], n_levels: int = 4):
    # our MultiHeadAttention nests Dense under to_q/... names already;
    # flax Dense leaf = kernel/bias.
    def key_fn(path):
        return _unet_key(path, n_levels)
    return _convert(our_tree, key_fn, hf_state)


# ---- VAE -----------------------------------------------------------------

def _vae_key(path: tuple[str, ...], n_levels: int) -> tuple[str, Callable]:
    p = list(path)
    if p[0] == "params":
        p = p[1:]
    tower = p[0]               # encoder / decoder
    name = p[1]
    leaf = p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    conv = lambda k: (k + "." + suff, t_conv if leaf == "kernel" else t_id)
    lin = lambda k: (k + "." + suff, t_linear if leaf == "kernel" else t_id)
    norm = lambda k: (k + "." + suff, t_id)
    import re

    if tower == "encoder":
        base = "encoder"
        if name == "quant_conv":
            return conv("quant_conv")
    else:
        base = "decoder"
        if name == "post_quant_conv":
            return conv("post_quant_conv")

    def res(blockbase, sub):
        m = {"norm1": norm(f"{blockbase}.norm1"), "conv1": conv(f"{blockbase}.conv1"),
             "norm2": norm(f"{blockbase}.norm2"), "conv2": conv(f"{blockbase}.conv2"),
             "skip": conv(f"{blockbase}.conv_shortcut")}
        return m[sub]

    if name == "conv_in":
        return conv(f"{base}.conv_in")
    if name == "conv_out":
        return conv(f"{base}.conv_out")
    if name == "norm_out":
        return norm(f"{base}.conv_norm_out")
    m = re.match(r"down_(\d+)_res_(\d+)$", name)
    if m:
        return res(f"{base}.down_blocks.{m[1]}.resnets.{m[2]}", p[2])
    m = re.match(r"down_(\d+)_ds$", name)
    if m:
        return conv(f"{base}.down_blocks.{m[1]}.downsamplers.0.conv")
    m = re.match(r"up_(\d+)_res_(\d+)$", name)
    if m:
        lvl = n_levels - 1 - int(m[1])
        return res(f"{base}.up_blocks.{lvl}.resnets.{m[2]}", p[2])
    m = re.match(r"up_(\d+)_us$", name)
    if m:
        lvl = n_levels - 1 - int(m[1])
        return conv(f"{base}.up_blocks.{lvl}.upsamplers.0.conv")
    m = re.match(r"mid_res_(\d+)$", name)
    if m:
        return res(f"{base}.mid_block.resnets.{m[1]}", p[2])
    if name == "mid_attn":
        sub = p[2]
        mm = {"norm": norm(f"{base}.mid_block.attentions.0.group_norm"),
              "q": lin(f"{base}.mid_block.attentions.0.to_q"),
              "k": lin(f"{base}.mid_block.attentions.0.to_k"),
              "v": lin(f"{base}.mid_block.attentions.0.to_v"),
              "proj_out": lin(f"{base}.mid_block.attentions.0.to_out.0")}
        return mm[sub]
    raise KeyError(f"unmapped VAE param {'/'.join(path)}")


def convert_vae(our_tree, hf_state: Mapping[str, Any], n_levels: int = 4):
    return _convert(our_tree, lambda p: _vae_key(p, n_levels), hf_state)


# ---- CLIP text -----------------------------------------------------------

def _clip_text_key(path: tuple[str, ...]) -> tuple[str, Callable]:
    p = list(path)
    if p[0] == "params":
        p = p[1:]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias",
            "embedding": "weight", "pos_emb": "weight"}[leaf if leaf in
            ("kernel", "scale", "bias", "embedding") else "pos_emb"]
    base = "text_model"
    lin = lambda k: (k + "." + suff, t_linear if leaf == "kernel" else t_id)
    norm = lambda k: (k + "." + suff, t_id)
    if name == "token_emb":
        return f"{base}.embeddings.token_embedding.weight", t_id
    if name == "pos_emb":
        return f"{base}.embeddings.position_embedding.weight", t_id
    if name == "ln_final":
        return norm(f"{base}.final_layer_norm")
    import re
    m = re.match(r"block_(\d+)$", name)
    if m:
        lb = f"{base}.encoder.layers.{m[1]}"
        sub = p[1]
        if sub in ("ln1", "ln2"):
            return norm(f"{lb}.layer_norm{sub[-1]}")
        if sub == "attn":
            s2 = p[2]
            mm = {"to_q": "q_proj", "to_k": "k_proj", "to_v": "v_proj",
                  "to_out": "out_proj"}
            return lin(f"{lb}.self_attn.{mm[s2]}")
        if sub in ("fc1", "fc2"):
            return lin(f"{lb}.mlp.{sub}")
    raise KeyError(f"unmapped CLIP-text param {'/'.join(path)}")


def convert_clip_text(our_tree, hf_state: Mapping[str, Any]):
    return _convert(our_tree, _clip_text_key, hf_state)


# ---- IO ------------------------------------------------------------------

def load_torch_state(path: str | Path) -> dict[str, np.ndarray]:
    """Load a .safetensors or torch .bin/.ckpt file into numpy."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file
        return dict(load_file(str(path)))
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def save_params(tree, path: str | Path) -> None:
    from flax.serialization import msgpack_serialize
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(msgpack_serialize(
        jax.tree.map(lambda x: np.asarray(x), tree)))


def load_params_file(path: str | Path):
    from flax.serialization import msgpack_restore
    return msgpack_restore(Path(path).read_bytes())


# ---- SAM (official segment-anything checkpoint naming) -------------------

def t_convT(w):  # torch ConvTranspose2d (I,O,kH,kW) -> flax (kH,kW,I,O)
    return np.transpose(w, (2, 3, 0, 1))


def t_pos_embed(w):  # (1,H,W,C) -> (H,W,C)
    return np.asarray(w)[0]


def _sam_key(path: tuple[str, ...]) -> tuple[str, "Callable"]:
    import re
    p = [q for q in path if q != "params"]
    tower, name, leaf = p[0], p[1], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf, leaf)
    conv = lambda k: (k + "." + suff, t_conv if leaf == "kernel" else t_id)
    convT = lambda k: (k + "." + suff, t_convT if leaf == "kernel" else t_id)
    lin = lambda k: (k + "." + suff, t_linear if leaf == "kernel" else t_id)
    norm = lambda k: (k + "." + suff, t_id)

    if tower == "encoder":
        b = "image_encoder"
        if name == "patch_embed":
            return conv(f"{b}.patch_embed.proj")
        if name == "pos_emb":
            return f"{b}.pos_embed", t_pos_embed
        m = re.match(r"block_(\d+)$", name)
        if m:
            lb = f"{b}.blocks.{m[1]}"
            sub = p[2]
            table = {"ln1": norm(f"{lb}.norm1"), "ln2": norm(f"{lb}.norm2"),
                     "qkv": lin(f"{lb}.attn.qkv"),
                     "proj": lin(f"{lb}.attn.proj"),
                     "mlp1": lin(f"{lb}.mlp.lin1"),
                     "mlp2": lin(f"{lb}.mlp.lin2"),
                     "rel_h": (f"{lb}.attn.rel_pos_h", t_id),
                     "rel_w": (f"{lb}.attn.rel_pos_w", t_id)}
            if sub in ("rel_h", "rel_w"):
                return table[sub]
            return table[sub]
        neck = {"neck1": conv(f"{b}.neck.0"), "neck_ln1": norm(f"{b}.neck.1"),
                "neck2": conv(f"{b}.neck.2"), "neck_ln2": norm(f"{b}.neck.3")}
        if name in neck:
            return neck[name]
    if tower == "prompt":
        if name == "pe_gaussian":
            return ("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
                    t_id)
        if name == "corner_emb":
            # box corners = point_embeddings 2 (top-left) and 3 (bottom-right);
            # converter callers stack them (see convert_sam docstring)
            return "prompt_encoder.box_corner_embeddings", t_id
    if tower == "decoder":
        b = "mask_decoder"
        if name == "iou_token":
            return f"{b}.iou_token.weight", t_id
        if name == "mask_tokens":
            return f"{b}.mask_tokens.weight", t_id
        m = re.match(r"block_(\d+)$", name)
        if m:
            lb = f"{b}.transformer.layers.{m[1]}"
            sub = p[2]
            attn_map = {"self": "self_attn",
                        "t2i": "cross_attn_token_to_image",
                        "i2t": "cross_attn_image_to_token"}
            am = re.match(r"(self|t2i|i2t)_(q|k|v|o)$", sub)
            if am:
                proj = {"q": "q_proj", "k": "k_proj", "v": "v_proj",
                        "o": "out_proj"}[am[2]]
                return lin(f"{lb}.{attn_map[am[1]]}.{proj}")
            ln_map = {"ln1": "norm1", "ln2": "norm2", "ln3": "norm3",
                      "ln4": "norm4"}
            if sub in ln_map:
                return norm(f"{lb}.{ln_map[sub]}")
            if sub == "mlp1":
                return lin(f"{lb}.mlp.lin1")
            if sub == "mlp2":
                return lin(f"{lb}.mlp.lin2")
        fm = re.match(r"fin_(q|k|v|o)$", name)
        if fm:
            proj = {"q": "q_proj", "k": "k_proj", "v": "v_proj",
                    "o": "out_proj"}[fm[1]]
            return lin(f"{b}.transformer.final_attn_token_to_image.{proj}")
        if name == "fin_ln":
            return norm(f"{b}.transformer.norm_final_attn")
        if name == "up1":
            return convT(f"{b}.output_upscaling.0")
        if name == "up_ln":
            return norm(f"{b}.output_upscaling.1")
        if name == "up2":
            return convT(f"{b}.output_upscaling.3")
        m = re.match(r"hyper_(\d+)_(\d+)$", name)
        if m:
            return lin(f"{b}.output_hypernetworks_mlps.{m[1]}.layers.{m[2]}")
        m = re.match(r"iou_(\d+)$", name)
        if m:
            return lin(f"{b}.iou_prediction_head.layers.{m[1]}")
    raise KeyError(f"unmapped SAM param {'/'.join(path)}")


def convert_sam(our_tree, sam_state: Mapping[str, Any]):
    """Official SAM checkpoint → our tree. Callers must pre-stack
    `prompt_encoder.point_embeddings.{2,3}.weight` into the synthetic key
    'prompt_encoder.box_corner_embeddings' (shape (2, C)):

        st['prompt_encoder.box_corner_embeddings'] = np.stack(
            [st['prompt_encoder.point_embeddings.2.weight'][0],
             st['prompt_encoder.point_embeddings.3.weight'][0]])
    """
    return _convert(our_tree, _sam_key, sam_state)
