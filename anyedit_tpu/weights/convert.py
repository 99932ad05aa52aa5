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
    if name == "text_proj":
        # CLIPTextModelWithProjection head (SDXL text_encoder_2 / SD3
        # towers); bias-free, lives OUTSIDE the text_model prefix.
        return "text_projection.weight", t_linear
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
    """Load a checkpoint into numpy: a single .safetensors / torch
    .bin/.ckpt file, a HF `*.index.json` shard index, or a directory of
    shards (model-0000X-of-0000N.safetensors — how Llama-8B / T5-XXL /
    Flux ship)."""
    path = Path(path)
    if path.name.endswith(".index.json"):
        import json
        wm = json.loads(path.read_text())["weight_map"]
        out: dict[str, np.ndarray] = {}
        for shard in sorted(set(wm.values())):
            out.update(load_torch_state(path.parent / shard))
        return out
    if path.is_dir():
        idx = sorted(path.glob("*.index.json"))
        if idx:
            return load_torch_state(idx[0])
        files = sorted(path.glob("*.safetensors")) or \
            sorted(path.glob("*.bin")) or sorted(path.glob("*.pth")) or \
            sorted(path.glob("*.ckpt"))
        if not files:
            raise FileNotFoundError(f"no checkpoint files under {path}")
        out = {}
        for f in files:
            out.update(load_torch_state(f))
        return out
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

def t_convT(w):  # torch ConvTranspose2d (I,O,kH,kW) -> flax transpose_kernel
    return np.transpose(w, (2, 3, 1, 0))      # (kH,kW,O,I)


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
        if name == "no_mask_emb":
            return ("prompt_encoder.no_mask_embed.weight",
                    lambda w: np.asarray(w).reshape(-1))
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


# ---- tuple-key support -----------------------------------------------------

def _convert2(tree, key_fn, src):
    """Like _convert but key_fn may return a TUPLE of source keys whose
    tensors are passed to the transform together (e.g. concat of split
    convs, stacked corner embeddings)."""

    def fill(jax_path, leaf):
        path = tuple(p.key for p in jax_path)
        hf_key, tf = key_fn(path)
        keys = hf_key if isinstance(hf_key, tuple) else (hf_key,)
        for k in keys:
            if k not in src:
                raise KeyError(f"missing source tensor {k!r} for "
                               f"{'/'.join(path)}")
        w = tf(*(src[k] for k in keys))
        if tuple(w.shape) != tuple(leaf.shape):
            raise ValueError(f"{hf_key}: shape {w.shape} vs ours {leaf.shape}")
        return np.asarray(w, dtype=np.float32)

    return jax.tree_util.tree_map_with_path(fill, tree)


# ---- BERT (HF bert-base-uncased / GroundingDINO text tower) ---------------

def _bert_key(path: tuple[str, ...], prefix: str = "") -> tuple[str, Callable]:
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf, leaf)
    lin = lambda k: (prefix + k + "." + suff,
                     t_linear if leaf == "kernel" else t_id)
    norm = lambda k: (prefix + k + "." + suff, t_id)
    if name == "tok":
        return prefix + "embeddings.word_embeddings.weight", t_id
    if name == "pos":
        return prefix + "embeddings.position_embeddings.weight", t_id
    if name == "type":
        return prefix + "embeddings.token_type_embeddings.weight", t_id
    if name == "emb_ln":
        return norm("embeddings.LayerNorm")
    m = re.match(r"layer_(\d+)$", name)
    if m:
        lb = f"encoder.layer.{m[1]}"
        sub = p[1]
        table = {"q": lin(f"{lb}.attention.self.query"),
                 "k": lin(f"{lb}.attention.self.key"),
                 "v": lin(f"{lb}.attention.self.value"),
                 "attn_out": lin(f"{lb}.attention.output.dense"),
                 "ln1": norm(f"{lb}.attention.output.LayerNorm"),
                 "fc1": lin(f"{lb}.intermediate.dense"),
                 "fc2": lin(f"{lb}.output.dense"),
                 "ln2": norm(f"{lb}.output.LayerNorm")}
        return table[sub]
    raise KeyError(f"unmapped BERT param {'/'.join(path)}")


def convert_bert(our_tree, hf_state: Mapping[str, Any], prefix: str = ""):
    """HF BertModel state dict → our BertEncoder tree. `prefix` handles
    nesting (GroundingDINO checkpoints store it under 'bert.')."""
    return _convert(our_tree, lambda p: _bert_key(p, prefix), hf_state)


# ---- Swin (GroundingDINO backbone / UperNet backbone) ---------------------

def _swin_key(path: tuple[str, ...], prefix: str = "") -> tuple[str, Callable]:
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf, leaf)
    conv = lambda k: (prefix + k + "." + suff,
                      t_conv if leaf == "kernel" else t_id)
    lin = lambda k: (prefix + k + "." + suff,
                     t_linear if leaf == "kernel" else t_id)
    norm = lambda k: (prefix + k + "." + suff, t_id)
    if name == "patch_embed":
        return conv("patch_embed.proj")
    if name == "patch_ln":
        return norm("patch_embed.norm")
    m = re.match(r"stage(\d+)_block(\d+)$", name)
    if m:
        lb = f"layers.{m[1]}.blocks.{m[2]}"
        sub = p[1]
        if sub == "rel_bias":
            return prefix + f"{lb}.attn.relative_position_bias_table", t_id
        table = {"ln1": norm(f"{lb}.norm1"), "qkv": lin(f"{lb}.attn.qkv"),
                 "proj": lin(f"{lb}.attn.proj"), "ln2": norm(f"{lb}.norm2"),
                 "mlp1": lin(f"{lb}.mlp.fc1"), "mlp2": lin(f"{lb}.mlp.fc2")}
        return table[sub]
    m = re.match(r"merge_ln(\d+)$", name)
    if m:   # our merge at stage i ↔ torch downsample of stage i-1
        return norm(f"layers.{int(m[1]) - 1}.downsample.norm")
    m = re.match(r"merge_fc(\d+)$", name)
    if m:
        return lin(f"layers.{int(m[1]) - 1}.downsample.reduction")
    m = re.match(r"out_ln(\d+)$", name)
    if m:
        return norm(f"norm{m[1]}")
    raise KeyError(f"unmapped Swin param {'/'.join(path)}")


# ---- GroundingDINO (official groundingdino_swin*.pth) ----------------------

def _split3(idx: int, leaf: str):
    """Slice one third of a fused torch in_proj_{weight,bias}."""
    def tf(w):
        c = w.shape[0] // 3
        part = w[idx * c:(idx + 1) * c]
        return t_linear(part) if leaf == "kernel" else np.asarray(part)
    return tf


def _gdino_key(path: tuple[str, ...]) -> tuple[Any, Callable]:
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias",
            "gamma": "weight", "beta": "bias"}.get(leaf, leaf)
    tsuff = {"kernel": "weight"}.get(leaf, "bias" if leaf == "bias" else "weight")
    del tsuff
    conv = lambda k: (k + "." + suff, t_conv if leaf == "kernel" else t_id)
    lin = lambda k: (k + "." + suff, t_linear if leaf == "kernel" else t_id)
    norm = lambda k: (k + "." + suff, t_id)

    if name == "bert":
        return _bert_key(tuple(p[1:]) + (leaf,), "bert.")
    if name == "swin":
        return _swin_key(tuple(p[1:]) + (leaf,), "backbone.0.")
    if name == "feat_map":
        return lin("feat_map")
    m = re.match(r"in_proj_(\d+)$", name)
    if m:
        return conv(f"input_proj.{m[1]}.0")
    m = re.match(r"in_ln_(\d+)$", name)
    if m:
        return norm(f"input_proj.{m[1]}.1")
    if name == "level_embed":
        return "transformer.level_embed", t_id
    if name == "mem_proj":
        return lin("transformer.enc_output")
    if name == "mem_ln":
        return norm("transformer.enc_output_norm")
    if name == "tgt_embed":
        return "transformer.tgt_embed.weight", t_id
    if name == "dec_norm":
        return norm("transformer.decoder.norm")
    m = re.match(r"ref_point_fc(\d)$", name)
    if m:
        return lin(f"transformer.decoder.ref_point_head.layers.{int(m[1]) - 1}")
    m = re.match(r"enc_box_head$", name)
    if m:
        j = {"fc1": 0, "fc2": 1, "fc3": 2}[p[1]]
        return lin(f"transformer.enc_out_bbox_embed.layers.{j}")
    m = re.match(r"dec_box_head_(\d+)$", name)
    if m:
        j = {"fc1": 0, "fc2": 1, "fc3": 2}[p[1]]
        return lin(f"bbox_embed.{m[1]}.layers.{j}")

    def deform(base, sub):
        table = {"value_proj": lin(f"{base}.value_proj"),
                 "sampling_offsets": lin(f"{base}.sampling_offsets"),
                 "attn_weights": lin(f"{base}.attention_weights"),
                 "out_proj": lin(f"{base}.output_proj")}
        return table[sub]

    m = re.match(r"enc_(\d+)$", name)
    if m:
        i, sub = m[1], p[1]
        tl = f"transformer.encoder.text_layers.{i}"
        fl = f"transformer.encoder.fusion_layers.{i}"
        vl = f"transformer.encoder.layers.{i}"
        if sub == "fusion":
            s2 = p[2]
            table = {"qi": lin(f"{fl}.attn.v_proj"),
                     "kt": lin(f"{fl}.attn.l_proj"),
                     "vt": lin(f"{fl}.attn.values_l_proj"),
                     "vi": lin(f"{fl}.attn.values_v_proj"),
                     "oi": lin(f"{fl}.attn.out_v_proj"),
                     "ot": lin(f"{fl}.attn.out_l_proj"),
                     "ln_i": norm(f"{fl}.layer_norm_v"),
                     "ln_t": norm(f"{fl}.layer_norm_l")}
            if s2 == "gamma_i":
                return f"{fl}.gamma_v", t_id
            if s2 == "gamma_t":
                return f"{fl}.gamma_l", t_id
            return table[s2]
        if sub in ("tq", "tk", "tv"):
            idx = {"tq": 0, "tk": 1, "tv": 2}[sub]
            key = f"{tl}.self_attn.in_proj_" + \
                ("weight" if leaf == "kernel" else "bias")
            return key, _split3(idx, leaf)
        table = {"to": lin(f"{tl}.self_attn.out_proj"),
                 "txt_ln": norm(f"{tl}.norm1"),
                 "img_ln": norm(f"{vl}.norm1")}
        if sub in table:
            return table[sub]
        if sub == "txt_ffn":
            return {"fc1": lin(f"{tl}.linear1"), "fc2": lin(f"{tl}.linear2"),
                    "ln": norm(f"{tl}.norm2")}[p[2]]
        if sub == "img_ffn":
            return {"fc1": lin(f"{vl}.linear1"), "fc2": lin(f"{vl}.linear2"),
                    "ln": norm(f"{vl}.norm2")}[p[2]]
        if sub == "deform":
            return deform(f"{vl}.self_attn", p[2])
    m = re.match(r"dec_(\d+)$", name)
    if m:
        dl = f"transformer.decoder.layers.{m[1]}"
        sub = p[1]
        if sub in ("sq", "sk", "sv"):
            idx = {"sq": 0, "sk": 1, "sv": 2}[sub]
            key = f"{dl}.self_attn.in_proj_" + \
                ("weight" if leaf == "kernel" else "bias")
            return key, _split3(idx, leaf)
        if sub in ("cq", "ck", "cv"):
            idx = {"cq": 0, "ck": 1, "cv": 2}[sub]
            key = f"{dl}.ca_text.in_proj_" + \
                ("weight" if leaf == "kernel" else "bias")
            return key, _split3(idx, leaf)
        table = {"so": lin(f"{dl}.self_attn.out_proj"),
                 "co": lin(f"{dl}.ca_text.out_proj"),
                 "ln_sa": norm(f"{dl}.norm2"),
                 "ln_ta": norm(f"{dl}.catext_norm"),
                 "ln_da": norm(f"{dl}.norm1")}
        if sub in table:
            return table[sub]
        if sub == "ffn":
            return {"fc1": lin(f"{dl}.linear1"), "fc2": lin(f"{dl}.linear2"),
                    "ln": norm(f"{dl}.norm3")}[p[2]]
        if sub == "deform":
            return deform(f"{dl}.cross_attn", p[2])
    raise KeyError(f"unmapped GDINO param {'/'.join(path)}")


def convert_gdino(our_tree, state: Mapping[str, Any]):
    """Official GroundingDINO checkpoint → our tree. Strips the DDP
    'module.' prefix. (The reference ContrastiveEmbed is a plain dot
    product — no learned scale or bias.)"""
    st = {k.removeprefix("module."): v for k, v in state.items()}
    return _convert2(our_tree, _gdino_key, st)


# ---- LaMa (saicinpainting big-lama generator) ------------------------------

def t_fu_pack(w):
    """FourierUnit channel order: torch interleaves (re,im) per channel
    ((b,c,2,h,w) view → 2c); ours concatenates [re..., im...]. Permute the
    1x1 conv kernel's I and O channel axes accordingly."""
    w = t_conv(w)                      # (1,1,2c, 2c_out)
    ci, co = w.shape[2], w.shape[3]
    perm_i = np.concatenate([np.arange(0, ci, 2), np.arange(1, ci, 2)])
    perm_o = np.concatenate([np.arange(0, co, 2), np.arange(1, co, 2)])
    return w[:, :, perm_i][:, :, :, perm_o]


def t_fu_vec(w):
    w = np.asarray(w)
    c = w.shape[0]
    perm = np.concatenate([np.arange(0, c, 2), np.arange(1, c, 2)])
    return w[perm]


def _lama_key(path: tuple[str, ...], n_down: int, n_blocks: int
              ) -> tuple[Any, Callable]:
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    bn_suff = {"gamma": "weight", "beta": "bias", "mean": "running_mean",
               "var": "running_var"}
    conv = lambda k: (k + ".weight" if leaf == "kernel" else k + ".bias",
                      t_conv if leaf == "kernel" else t_id)
    convT = lambda k: (k + ".weight" if leaf == "kernel" else k + ".bias",
                       (lambda w: np.transpose(w, (2, 3, 1, 0)))
                       if leaf == "kernel" else t_id)
    bn = lambda k: (k + "." + bn_suff[leaf], t_id)

    if name == "stem":
        return conv("model.1.ffc.convl2l")
    if name == "stem_bn":
        return bn("model.1.bn_l")
    m = re.match(r"down_(\d+)$", name)
    if m:
        i = int(m[1])
        base = f"model.{2 + i}"
        if i < n_down - 1:
            return conv(f"{base}.ffc.convl2l")
        # last downsample splits into local+global convs: concat on O
        if leaf == "kernel":
            return ((f"{base}.ffc.convl2l.weight", f"{base}.ffc.convl2g.weight"),
                    lambda a, b: np.concatenate([t_conv(a), t_conv(b)], axis=-1))
        return ((f"{base}.ffc.convl2l.bias", f"{base}.ffc.convl2g.bias"),
                lambda a, b: np.concatenate([a, b]))
    m = re.match(r"down_bn_(\d+)$", name)
    if m:
        i = int(m[1])
        base = f"model.{2 + i}"
        if i < n_down - 1:
            return bn(f"{base}.bn_l")
        kl, _ = bn(f"{base}.bn_l")
        kg, _ = bn(f"{base}.bn_g")
        return (kl, kg), lambda a, b: np.concatenate([a, b])
    m = re.match(r"block_(\d+)$", name)
    if m:
        # Sequential layout: 0 pad, 1 stem, 2..1+nd downs, 2+nd..1+nd+nb
        # blocks, 2+nd+nb concat, then (convT, BN, ReLU) trios, pad, out
        base = f"model.{2 + n_down + int(m[1])}"
        sub = p[1]
        if sub in ("ffc1", "ffc2"):
            cb = f"{base}.conv{sub[-1]}.ffc"
            s2 = p[2]
            if s2 in ("l2l", "l2g", "g2l"):
                return conv(f"{cb}.conv{s2}")
            # g2g = SpectralTransform (lazy dispatch: bn()/conv() suffix
            # tables depend on the leaf kind)
            s3 = p[3]
            if s3 == "down":
                return conv(f"{cb}.convg2g.conv1.0")
            if s3 == "bn1":
                return bn(f"{cb}.convg2g.conv1.1")
            if s3 == "up":
                return conv(f"{cb}.convg2g.conv2")
            if s3 == "fu_conv":
                k = f"{cb}.convg2g.fu.conv_layer." + \
                    ("weight" if leaf == "kernel" else "bias")
                return k, (t_fu_pack if leaf == "kernel" else t_fu_vec)
            if s3 == "fu_bn":
                k, _ = bn(f"{cb}.convg2g.fu.bn")
                return k, t_fu_vec
        table = {"bn1_l": bn(f"{base}.conv1.bn_l"),
                 "bn1_g": bn(f"{base}.conv1.bn_g"),
                 "bn2_l": bn(f"{base}.conv2.bn_l"),
                 "bn2_g": bn(f"{base}.conv2.bn_g")}
        if sub in table:
            return table[sub]
    m = re.match(r"up_(\d+)$", name)
    if m:
        return convT(f"model.{3 + n_down + n_blocks + 3 * int(m[1])}")
    m = re.match(r"up_bn_(\d+)$", name)
    if m:
        return bn(f"model.{4 + n_down + n_blocks + 3 * int(m[1])}")
    if name == "out":
        return conv(f"model.{4 + 4 * n_down + n_blocks}")
    raise KeyError(f"unmapped LaMa param {'/'.join(path)}")


def convert_lama(our_tree, state: Mapping[str, Any], n_down: int = 3,
                 n_blocks: int = 9):
    """saicinpainting big-lama generator state dict → our tree. Strips the
    'generator.' prefix if present (the released best.ckpt nests it)."""
    st = {k.removeprefix("generator."): v for k, v in state.items()}
    return _convert2(our_tree, lambda p: _lama_key(p, n_down, n_blocks), st)


# ---- CLIP vision (HF CLIPVisionModelWithProjection) ------------------------

def t_patch_conv(w):  # (O,I,P,P) conv, no bias in CLIP patch embedding
    return np.transpose(w, (2, 3, 1, 0))


def _clip_vision_key(path: tuple[str, ...]) -> tuple[str, Callable]:
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf, leaf)
    base = "vision_model"
    lin = lambda k: (k + "." + suff, t_linear if leaf == "kernel" else t_id)
    norm = lambda k: (k + "." + suff, t_id)
    if name == "patch_emb":
        return f"{base}.embeddings.patch_embedding.weight", t_patch_conv
    if name == "cls":
        return f"{base}.embeddings.class_embedding", t_id
    if name == "pos_emb":
        return f"{base}.embeddings.position_embedding.weight", t_id
    if name == "pre_ln":
        # (sic) HF's historical typo in the param name
        return norm(f"{base}.pre_layrnorm")
    if name == "post_ln":
        return norm(f"{base}.post_layernorm")
    if name == "visual_proj":
        return "visual_projection.weight", t_linear
    m = re.match(r"block_(\d+)$", name)
    if m:
        lb = f"{base}.encoder.layers.{m[1]}"
        sub = p[1]
        if sub in ("ln1", "ln2"):
            return norm(f"{lb}.layer_norm{sub[-1]}")
        if sub == "attn":
            mm = {"to_q": "q_proj", "to_k": "k_proj", "to_v": "v_proj",
                  "to_out": "out_proj"}
            return lin(f"{lb}.self_attn.{mm[p[2]]}")
        if sub in ("fc1", "fc2"):
            return lin(f"{lb}.mlp.{sub}")
    raise KeyError(f"unmapped CLIP-vision param {'/'.join(path)}")


def convert_clip_vision(our_tree, hf_state: Mapping[str, Any]):
    return _convert(our_tree, _clip_vision_key, hf_state)


# ---- LAION aesthetic MLP ----------------------------------------------------

def _aesthetic_key(path: tuple[str, ...]) -> tuple[str, Callable]:
    """The sac+logos+ava1-l14-linearMSE predictor is a plain torch
    Sequential: Linear(768,1024) Drop Linear(1024,128) Drop Linear(128,64)
    Drop Linear(64,16) Linear(16,1) → layers.{0,2,4,6,7} (pre_filter.py:38-81)."""
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = "weight" if leaf == "kernel" else "bias"
    idx = {"fc0": 0, "fc1": 2, "fc2": 4, "fc3": 6, "out": 7}[name]
    return f"layers.{idx}.{suff}", (t_linear if leaf == "kernel" else t_id)


def convert_aesthetic(our_tree, state: Mapping[str, Any]):
    return _convert(our_tree, _aesthetic_key, state)


# ---- Llama (HF LlamaForCausalLM / Llama-3-8B-Instruct) ---------------------

def _llama_key(path: tuple[str, ...]) -> tuple[str, Callable]:
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    lin = lambda k: (k + ".weight", t_linear)
    if name == "tok":
        return "model.embed_tokens.weight", t_id
    if name == "norm_f":
        return "model.norm.weight", t_id
    if name == "lm_head":
        return lin("lm_head")
    m = re.match(r"layer_(\d+)$", name)
    if m:
        lb = f"model.layers.{m[1]}"
        sub = p[1]
        table = {"wq": lin(f"{lb}.self_attn.q_proj"),
                 "wk": lin(f"{lb}.self_attn.k_proj"),
                 "wv": lin(f"{lb}.self_attn.v_proj"),
                 "wo": lin(f"{lb}.self_attn.o_proj"),
                 "w_gate": lin(f"{lb}.mlp.gate_proj"),
                 "w_up": lin(f"{lb}.mlp.up_proj"),
                 "w_down": lin(f"{lb}.mlp.down_proj"),
                 "attn_norm": (f"{lb}.input_layernorm.weight", t_id),
                 "mlp_norm": (f"{lb}.post_attention_layernorm.weight", t_id)}
        return table[sub]
    raise KeyError(f"unmapped Llama param {'/'.join(path)}")


def convert_llama(our_tree, hf_state: Mapping[str, Any]):
    return _convert(our_tree, _llama_key, hf_state)


# ---- T5 encoder (HF T5EncoderModel, v1.1 gated-gelu: Flux/SD3/BLIP-2) ------

def _t5_key(path: tuple[str, ...]) -> tuple[str, Callable]:
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    lin = lambda k: (k + ".weight", t_linear)
    if name == "emb":
        return "shared.weight", t_id
    if name == "ln_final":
        return "encoder.final_layer_norm.weight", t_id
    m = re.match(r"(ln_a|ln_f|attn|ffn)_(\d+)$", name)
    if m:
        kind, i = m[1], m[2]
        blk = f"encoder.block.{i}.layer"
        if kind == "ln_a":
            return f"{blk}.0.layer_norm.weight", t_id
        if kind == "ln_f":
            return f"{blk}.1.layer_norm.weight", t_id
        if kind == "attn":
            sub = p[1]
            if sub == "rel_bias":
                return (f"{blk}.0.SelfAttention.relative_attention_bias.weight",
                        t_id)
            return lin(f"{blk}.0.SelfAttention.{sub}")
        if kind == "ffn":
            # HF keeps the module name "DenseReluDense" even for gated-gelu
            mm = {"wi0": "wi_0", "wi1": "wi_1", "wo": "wo"}
            return lin(f"{blk}.1.DenseReluDense.{mm[p[1]]}")
    raise KeyError(f"unmapped T5 param {'/'.join(path)}")


def convert_t5_encoder(our_tree, hf_state: Mapping[str, Any]):
    return _convert(our_tree, _t5_key, hf_state)


# ---- DINOv2 (HF Dinov2Model) ------------------------------------------------

def _dinov2_key(path: tuple[str, ...]):
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf, leaf)
    lin = lambda k: (k + "." + suff, t_linear if leaf == "kernel" else t_id)
    norm = lambda k: (k + "." + suff, t_id)
    if name == "patch_embed":
        return (f"embeddings.patch_embeddings.projection.{suff}",
                t_conv if leaf == "kernel" else t_id)
    if name == "cls":
        return "embeddings.cls_token", lambda w: np.asarray(w)[0, 0]
    if name == "pos":
        return "embeddings.position_embeddings", lambda w: np.asarray(w)[0]
    if name == "ln_final":
        return norm("layernorm")
    m = re.match(r"block_(\d+)$", name)
    if m:
        lb = f"encoder.layer.{m[1]}"
        sub = p[1]
        if sub == "qkv":
            # HF keeps q/k/v separate; fuse on the output axis
            keys = tuple(f"{lb}.attention.attention.{w}.{suff}"
                         for w in ("query", "key", "value"))
            if leaf == "kernel":
                return keys, lambda q, k, v: np.concatenate(
                    [t_linear(q), t_linear(k), t_linear(v)], axis=-1)
            return keys, lambda q, k, v: np.concatenate([q, k, v])
        table = {"ln1": norm(f"{lb}.norm1"), "ln2": norm(f"{lb}.norm2"),
                 "proj": lin(f"{lb}.attention.output.dense"),
                 "fc1": lin(f"{lb}.mlp.fc1"), "fc2": lin(f"{lb}.mlp.fc2")}
        if sub in table:
            return table[sub]
        if sub == "ls1":
            return f"{lb}.layer_scale1.lambda1", t_id
        if sub == "ls2":
            return f"{lb}.layer_scale2.lambda1", t_id
    raise KeyError(f"unmapped DINOv2 param {'/'.join(path)}")


def convert_dinov2(our_tree, hf_state: Mapping[str, Any]):
    return _convert2(our_tree, _dinov2_key, hf_state)


# ---- HED (lllyasviel ControlNetHED_Apache2) ---------------------------------

def _hed_key(path: tuple[str, ...]):
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    if name == "norm":
        return "norm", lambda w: np.asarray(w).reshape(3)
    m = re.match(r"b(\d)_conv(\d)$", name)
    if m:
        k = f"block{int(m[1]) + 1}.convs.{m[2]}." + \
            ("weight" if leaf == "kernel" else "bias")
        return k, (t_conv if leaf == "kernel" else t_id)
    m = re.match(r"b(\d)_proj$", name)
    if m:
        k = f"block{int(m[1]) + 1}.projection." + \
            ("weight" if leaf == "kernel" else "bias")
        return k, (t_conv if leaf == "kernel" else t_id)
    raise KeyError(f"unmapped HED param {'/'.join(path)}")


def convert_hed(our_tree, state: Mapping[str, Any]):
    return _convert(our_tree, _hed_key, state)


# ---- DepthAnythingV2 (official checkpoint: pretrained.* + depth_head.*) ----

def t_convT4(w):  # torch ConvTranspose2d (I,O,kH,kW) → flax (kH,kW,O,I)
    return np.transpose(w, (2, 3, 1, 0))


def _da2_key(path: tuple[str, ...]):
    import re
    p = [q for q in path if q != "params"]
    leaf = p[-1]
    suff = "weight" if leaf in ("kernel", "scale") else \
        ("bias" if leaf == "bias" else leaf)
    lin = lambda k: (k + "." + suff, t_linear if leaf == "kernel" else t_id)
    conv = lambda k: (k + "." + suff, t_conv if leaf == "kernel" else t_id)
    convT = lambda k: (k + "." + suff, t_convT4 if leaf == "kernel" else t_id)
    norm = lambda k: (k + "." + suff, t_id)

    if p[0] == "backbone":
        # official DINOv2 naming (fused qkv, ls gamma), NOT the HF layout
        b = "pretrained"
        name = p[1]
        if name == "patch_embed":
            return conv(f"{b}.patch_embed.proj")
        if name == "cls":
            return f"{b}.cls_token", lambda w: np.asarray(w)[0, 0]
        if name == "pos":
            return f"{b}.pos_embed", lambda w: np.asarray(w)[0]
        if name == "ln_final":
            return norm(f"{b}.norm")
        m = re.match(r"block_(\d+)$", name)
        if m:
            lb = f"{b}.blocks.{m[1]}"
            sub = p[2]
            table = {"ln1": norm(f"{lb}.norm1"), "qkv": lin(f"{lb}.attn.qkv"),
                     "proj": lin(f"{lb}.attn.proj"), "ln2": norm(f"{lb}.norm2"),
                     "fc1": lin(f"{lb}.mlp.fc1"), "fc2": lin(f"{lb}.mlp.fc2")}
            if sub in table:
                return table[sub]
            if sub == "ls1":
                return f"{lb}.ls1.gamma", t_id
            if sub == "ls2":
                return f"{lb}.ls2.gamma", t_id
    if p[0] == "head":
        h = "depth_head"
        name = p[1]
        m = re.match(r"proj_(\d)$", name)
        if m:
            return conv(f"{h}.projects.{m[1]}")
        m = re.match(r"resize_(\d)$", name)
        if m:
            i = m[1]
            return (convT if i in ("0", "1") else conv)(f"{h}.resize_layers.{i}")
        m = re.match(r"layer(\d)_rn$", name)
        if m:
            return conv(f"{h}.scratch.layer{m[1]}_rn")
        m = re.match(r"refinenet(\d)_(rcu1|rcu2|out)$", name)
        if m:
            rb = f"{h}.scratch.refinenet{m[1]}"
            if m[2] == "out":
                return conv(f"{rb}.out_conv")
            unit = {"rcu1": "resConfUnit1", "rcu2": "resConfUnit2"}[m[2]]
            return conv(f"{rb}.{unit}.{p[2]}")
        if name == "out1":
            return conv(f"{h}.scratch.output_conv1")
        if name == "out2":
            return conv(f"{h}.scratch.output_conv2.0")
        if name == "out3":
            return conv(f"{h}.scratch.output_conv2.2")
    raise KeyError(f"unmapped DepthAnything param {'/'.join(path)}")


def convert_depth_anything(our_tree, state: Mapping[str, Any]):
    return _convert2(our_tree, _da2_key, state)


# ---- SDXL / SD2.1 UNet (use_linear_projection transformers) ----------------

def t_lin_as_conv11(w):
    """diffusers Linear (O,I) → our 1x1 conv kernel (1,1,I,O)."""
    return np.transpose(w)[None, None]


def _unet_key_linear_proj(path: tuple[str, ...], n_levels: int):
    """SDXL/SD2.1 variant: SpatialTransformer proj_in/proj_out are Linear
    in diffusers (use_linear_in_transformer) but 1x1 convs here."""
    key, tf = _unet_key(path, n_levels)
    p = [q for q in path if q != "params"]
    if len(p) >= 2 and p[1] in ("proj_in", "proj_out") and p[-1] == "kernel":
        return key, t_lin_as_conv11
    return key, tf


def convert_unet_sdxl(our_tree, hf_state: Mapping[str, Any], n_levels: int = 3):
    return _convert(our_tree, lambda p: _unet_key_linear_proj(p, n_levels),
                    hf_state)


# ---- ldm-naming converters (AnyDoor ControlLDM checkpoint) -----------------
#
# AnyDoor ships one torch checkpoint holding the whole ControlLDM
# (cldm/cldm.py:307): `model.diffusion_model.*` (ControlledUnetModel in ldm
# openaimodel naming), `control_model.*` (ControlNet), `first_stage_model.*`
# (ldm AutoencoderKL naming), `cond_stage_model.projector.*` (DINOv2→context
# linear, ldm encoders modules.py:279). These walkers map that naming onto
# our Flax trees; use_linear_in_transformer=True per anydoor.yaml.

def t_conv11_as_lin(w):
    """ldm Conv2d 1x1 (O,I,1,1) → our Dense kernel (I,O)."""
    return np.transpose(np.asarray(w)[:, :, 0, 0])


def _ldm_res_sub(base: str, sub: str, leaf: str):
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    tf = t_conv if leaf == "kernel" else t_id
    m = {"norm1": (f"{base}.in_layers.0.{suff}", t_id),
         "conv1": (f"{base}.in_layers.2.{suff}", tf),
         "time_emb_proj": (f"{base}.emb_layers.1.{suff}",
                           t_linear if leaf == "kernel" else t_id),
         "norm2": (f"{base}.out_layers.0.{suff}", t_id),
         "conv2": (f"{base}.out_layers.3.{suff}", tf),
         "skip": (f"{base}.skip_connection.{suff}", tf)}
    return m[sub]


def _ldm_tf_sub(base: str, p: list[str], linear_proj: bool):
    """Transformer sub-keys: ldm BasicTransformerBlock matches diffusers
    (attn1/attn2/ff.net.0.proj/net.2, norm1-3); proj_in/out are Linear when
    use_linear_in_transformer (mapped onto our 1x1 convs)."""
    leaf = p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    sub = p[1]
    if sub == "norm":
        return f"{base}.norm.{suff}", t_id
    if sub in ("proj_in", "proj_out"):
        if leaf == "kernel":
            return (f"{base}.{sub}.weight",
                    t_lin_as_conv11 if linear_proj else t_conv)
        return f"{base}.{sub}.bias", t_id
    d = sub.split("_")[1]
    tb = f"{base}.transformer_blocks.{d}"
    s2 = p[2]
    if s2 in ("norm1", "norm2", "norm3"):
        return f"{tb}.{s2}.{suff}", t_id
    if s2 in ("attn1", "attn2"):
        s3 = p[3]
        tgt = f"{tb}.{s2}.to_out.0" if s3 == "to_out" else f"{tb}.{s2}.{s3}"
        return f"{tgt}.{suff}", (t_linear if leaf == "kernel" else t_id)
    if s2 == "ff":
        tgt = f"{tb}.ff.net.0.proj" if p[3] == "GEGLU_0" else f"{tb}.ff.net.2"
        return f"{tgt}.{suff}", (t_linear if leaf == "kernel" else t_id)
    raise KeyError(tuple(p))


def _ldm_unet_key(path: tuple[str, ...], n_levels: int, lpb: int,
                  attn_levels: tuple[bool, ...], prefix: str,
                  linear_proj: bool = True):
    """Our UNet2DCondition param path → ldm openaimodel state-dict key."""
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    tf_conv = t_conv if leaf == "kernel" else t_id
    tf_lin = t_linear if leaf == "kernel" else t_id

    def down_idx(lvl, i):
        return 1 + lvl * (lpb + 1) + i

    if name == "conv_in":
        return f"{prefix}input_blocks.0.0.{suff}", tf_conv
    if name == "conv_out":
        return f"{prefix}out.2.{suff}", tf_conv
    if name == "norm_out":
        return f"{prefix}out.0.{suff}", t_id
    if name == "time_fc1":
        return f"{prefix}time_embed.0.{suff}", tf_lin
    if name == "time_fc2":
        return f"{prefix}time_embed.2.{suff}", tf_lin

    m = re.match(r"down_(\d+)_res_(\d+)$", name)
    if m:
        base = f"{prefix}input_blocks.{down_idx(int(m[1]), int(m[2]))}.0"
        return _ldm_res_sub(base, p[1], leaf)
    m = re.match(r"down_(\d+)_tf_(\d+)$", name)
    if m:
        base = f"{prefix}input_blocks.{down_idx(int(m[1]), int(m[2]))}.1"
        return _ldm_tf_sub(base, p, linear_proj)
    m = re.match(r"down_(\d+)_ds$", name)
    if m:
        idx = 1 + int(m[1]) * (lpb + 1) + lpb
        return f"{prefix}input_blocks.{idx}.0.op.{suff}", tf_conv
    m = re.match(r"mid_res_(\d+)$", name)
    if m:
        return _ldm_res_sub(f"{prefix}middle_block.{2 * int(m[1])}", p[1], leaf)
    if name == "mid_tf":
        return _ldm_tf_sub(f"{prefix}middle_block.1", p, linear_proj)
    m = re.match(r"up_(\d+)_res_(\d+)$", name)
    if m:
        idx = (n_levels - 1 - int(m[1])) * (lpb + 1) + int(m[2])
        return _ldm_res_sub(f"{prefix}output_blocks.{idx}.0", p[1], leaf)
    m = re.match(r"up_(\d+)_tf_(\d+)$", name)
    if m:
        idx = (n_levels - 1 - int(m[1])) * (lpb + 1) + int(m[2])
        return _ldm_tf_sub(f"{prefix}output_blocks.{idx}.1", p, linear_proj)
    m = re.match(r"up_(\d+)_us$", name)
    if m:
        lvl = int(m[1])
        idx = (n_levels - 1 - lvl) * (lpb + 1) + lpb
        slot = 2 if attn_levels[lvl] else 1
        return f"{prefix}output_blocks.{idx}.{slot}.conv.{suff}", tf_conv
    raise KeyError(f"unmapped ldm UNet param {'/'.join(path)}")


def convert_ldm_unet(our_tree, state: Mapping[str, Any], n_levels: int = 4,
                     lpb: int = 2,
                     attn_levels: tuple[bool, ...] = (True, True, True, False),
                     prefix: str = "model.diffusion_model.",
                     linear_proj: bool = True):
    """ControlledUnetModel / ldm UNetModel weights → our UNet2DCondition."""
    return _convert(our_tree,
                    lambda p: _ldm_unet_key(p, n_levels, lpb, attn_levels,
                                            prefix, linear_proj), state)


def _controlnet_key(path: tuple[str, ...], n_levels: int, lpb: int,
                    attn_levels: tuple[bool, ...], n_zero_mid: int,
                    prefix: str, linear_proj: bool = True):
    """Our ControlNet param path → cldm ControlNet key (control_model.*)."""
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    tf_conv = t_conv if leaf == "kernel" else t_id

    if name == "hint_encoder":
        sub = p[1]
        if sub == "proj":
            return f"{prefix}input_hint_block.14.{suff}", tf_conv
        i = int(sub.split("_")[1])
        return f"{prefix}input_hint_block.{2 * i}.{suff}", tf_conv
    m = re.match(r"zero_(\d+)$", name)
    if m:
        n = int(m[1])
        if n == n_zero_mid:
            return f"{prefix}middle_block_out.0.{suff}", tf_conv
        return f"{prefix}zero_convs.{n}.0.{suff}", tf_conv
    return _ldm_unet_key(path, n_levels, lpb, attn_levels, prefix, linear_proj)


def convert_controlnet_anydoor(our_tree, state: Mapping[str, Any],
                               n_levels: int = 4, lpb: int = 2,
                               attn_levels: tuple[bool, ...] =
                               (True, True, True, False),
                               prefix: str = "control_model.",
                               linear_proj: bool = True):
    import re
    params = our_tree["params"] if "params" in our_tree else our_tree
    zeros = [int(m[1]) for k in params
             if (m := re.match(r"zero_(\d+)$", k))]
    n_zero_mid = max(zeros)
    return _convert(our_tree,
                    lambda p: _controlnet_key(p, n_levels, lpb, attn_levels,
                                              n_zero_mid, prefix, linear_proj),
                    state)


def _ldm_vae_res_sub(base: str, sub: str, leaf: str):
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    tf = t_conv if leaf == "kernel" else t_id
    m = {"norm1": (f"{base}.norm1.{suff}", t_id),
         "conv1": (f"{base}.conv1.{suff}", tf),
         "norm2": (f"{base}.norm2.{suff}", t_id),
         "conv2": (f"{base}.conv2.{suff}", tf),
         "skip": (f"{base}.nin_shortcut.{suff}", tf)}
    return m[sub]


def _ldm_vae_key(path: tuple[str, ...], prefix: str):
    """Our AutoencoderKL param path → ldm autoencoder key."""
    import re
    p = [q for q in path if q != "params"]
    half, name, leaf = p[0], p[1], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
    tf_conv = t_conv if leaf == "kernel" else t_id

    if name == "quant_conv":
        return f"{prefix}quant_conv.{suff}", tf_conv
    if name == "post_quant_conv":
        return f"{prefix}post_quant_conv.{suff}", tf_conv
    base = f"{prefix}{half}"
    if name == "conv_in":
        return f"{base}.conv_in.{suff}", tf_conv
    if name == "conv_out":
        return f"{base}.conv_out.{suff}", tf_conv
    if name == "norm_out":
        return f"{base}.norm_out.{suff}", t_id
    m = re.match(r"(down|up)_(\d+)_res_(\d+)$", name)
    if m:
        return _ldm_vae_res_sub(
            f"{base}.{m[1]}.{m[2]}.block.{m[3]}", p[2], leaf)
    m = re.match(r"down_(\d+)_ds$", name)
    if m:
        return f"{base}.down.{m[1]}.downsample.conv.{suff}", tf_conv
    m = re.match(r"up_(\d+)_us$", name)
    if m:
        return f"{base}.up.{m[1]}.upsample.conv.{suff}", tf_conv
    m = re.match(r"mid_res_(\d+)$", name)
    if m:
        return _ldm_vae_res_sub(f"{base}.mid.block_{int(m[1]) + 1}", p[2], leaf)
    if name == "mid_attn":
        sub = p[2]
        a = f"{base}.mid.attn_1"
        if sub == "norm":
            return f"{a}.norm.{suff}", t_id
        # q/k/v/proj_out: ldm Conv2d 1x1 → our Dense
        return (f"{a}.{sub}.{suff}",
                t_conv11_as_lin if leaf == "kernel" else t_id)
    raise KeyError(f"unmapped ldm VAE param {'/'.join(path)}")


def convert_vae_ldm(our_tree, state: Mapping[str, Any],
                    prefix: str = "first_stage_model."):
    return _convert(our_tree, lambda p: _ldm_vae_key(p, prefix), state)


def convert_anydoor_projector(our_tree, state: Mapping[str, Any],
                              prefix: str = "cond_stage_model.projector."):
    """FrozenDinoV2Encoder.projector (Linear 1536→1024) → our _Proj Dense."""
    def key_fn(path):
        leaf = path[-1]
        if leaf == "kernel":
            return f"{prefix}weight", t_linear
        return f"{prefix}bias", t_id
    return _convert(our_tree, key_fn, state)


def _dinov2_hub_key(path: tuple[str, ...]):
    """torch-hub DINOv2 naming (dinov2_vitg14_pretrain.pth — what AnyDoor's
    FrozenDinoV2Encoder loads, ldm encoders modules.py:279) → our DinoV2."""
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]

    if name == "cls":
        return "cls_token", lambda w: np.asarray(w).reshape(-1)
    if name == "pos":
        return "pos_embed", lambda w: np.asarray(w)[0]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf)
    tf_lin = t_linear if leaf == "kernel" else t_id
    if name == "patch_embed":
        return f"patch_embed.proj.{suff}", (t_conv if leaf == "kernel" else t_id)
    if name == "ln_final":
        return f"norm.{suff}", t_id
    m = re.match(r"block_(\d+)$", name)
    if m:
        b = f"blocks.{m[1]}"
        sub = p[1]
        if sub in ("ls1", "ls2"):       # LayerScale: bare gamma leaf
            return f"{b}.{sub}.gamma", t_id
        table = {"ln1": f"{b}.norm1.{suff}", "ln2": f"{b}.norm2.{suff}",
                 "qkv": f"{b}.attn.qkv.{suff}",
                 "proj": f"{b}.attn.proj.{suff}",
                 "fc1": f"{b}.mlp.fc1.{suff}", "fc2": f"{b}.mlp.fc2.{suff}",
                 "w12": f"{b}.mlp.w12.{suff}", "w3": f"{b}.mlp.w3.{suff}"}
        key = table[sub]
        if sub in ("ln1", "ln2"):
            return key, t_id
        return key, tf_lin
    raise KeyError(f"unmapped DINOv2-hub param {'/'.join(path)}")


def convert_dinov2_hub(our_tree, state: Mapping[str, Any]):
    """Convert a torch-hub DINOv2 checkpoint, interpolating the positional
    grid to our config's resolution (dinov2 interpolate_pos_encoding)."""
    state = dict(state)
    params = our_tree["params"] if "params" in our_tree else our_tree
    n_ours = params["pos"].shape[0] - 1
    pe = np.asarray(state["pos_embed"], np.float32)
    n_src = pe.shape[1] - 1
    if n_src != n_ours:
        g0, g1 = int(np.sqrt(n_src)), int(np.sqrt(n_ours))
        d = pe.shape[-1]
        grid = jax.image.resize(pe[0, 1:].reshape(g0, g0, d), (g1, g1, d),
                                method="bicubic")
        state["pos_embed"] = np.concatenate(
            [pe[:, :1], np.asarray(grid, np.float32).reshape(1, g1 * g1, d)],
            axis=1)
    return _convert(our_tree, _dinov2_hub_key, state)


# ---- SD3 MM-DiT (diffusers SD3Transformer2DModel) ---------------------------

def t_patch_conv_as_dense(w):
    """PatchEmbed Conv2d (D, C, p, p) → our patch_in Dense ((p·p·C), D) with
    (ph, pw, c) feature flattening order."""
    w = np.asarray(w)
    return np.transpose(w, (2, 3, 1, 0)).reshape(-1, w.shape[0])


def t_swap_halves_lin(w):
    """AdaLayerNormContinuous stores (scale ‖ shift); ours is (shift ‖ scale).
    Swap the output halves, then torch-Linear → Flax kernel."""
    w = np.asarray(w)
    d = w.shape[0] // 2
    return np.transpose(np.concatenate([w[d:], w[:d]], axis=0))


def t_swap_halves_bias(w):
    w = np.asarray(w)
    d = w.shape[0] // 2
    return np.concatenate([w[d:], w[:d]], axis=0)


def _mmdit_key(path: tuple[str, ...], last_block: int):
    """Our MMDiT param path → diffusers SD3Transformer2DModel key.

    Chunk-order assumptions (documented for golden validation):
    AdaLayerNormZero emits (shift_msa, scale_msa, gate_msa, shift_mlp,
    scale_mlp, gate_mlp) — matches our 6-way split; AdaLayerNormContinuous
    emits (scale, shift) — swapped into our shift-first layout.
    """
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    tf_lin = t_linear if leaf == "kernel" else t_id

    if name == "pos_emb":
        raise KeyError("pos_emb is handled by convert_mmdit (needs grid size)")
    if name == "patch_in":
        if leaf == "kernel":
            return "pos_embed.proj.weight", t_patch_conv_as_dense
        return "pos_embed.proj.bias", t_id
    if name == "ctx_in":
        return f"context_embedder.{'weight' if leaf == 'kernel' else 'bias'}", tf_lin
    if name == "t_fc1":
        return f"time_text_embed.timestep_embedder.linear_1.{'weight' if leaf == 'kernel' else 'bias'}", tf_lin
    if name == "t_fc2":
        return f"time_text_embed.timestep_embedder.linear_2.{'weight' if leaf == 'kernel' else 'bias'}", tf_lin
    if name == "p_fc1":
        return f"time_text_embed.text_embedder.linear_1.{'weight' if leaf == 'kernel' else 'bias'}", tf_lin
    if name == "p_fc2":
        return f"time_text_embed.text_embedder.linear_2.{'weight' if leaf == 'kernel' else 'bias'}", tf_lin
    if name == "final_mod":
        if leaf == "kernel":
            return "norm_out.linear.weight", t_swap_halves_lin
        return "norm_out.linear.bias", t_swap_halves_bias
    if name == "patch_out":
        return f"proj_out.{'weight' if leaf == 'kernel' else 'bias'}", tf_lin

    m = re.match(r"block_(\d+)$", name)
    if not m:
        raise KeyError(f"unmapped MMDiT param {'/'.join(path)}")
    i = int(m[1])
    b = f"transformer_blocks.{i}"
    sub = p[1]
    suff = "weight" if leaf in ("kernel", "scale", "g") else "bias"

    if sub == "img_mod":
        return f"{b}.norm1.linear.{suff}", tf_lin
    if sub == "txt_mod":
        if i == last_block:   # AdaLayerNormContinuous: swap (scale‖shift)
            if leaf == "kernel":
                return f"{b}.norm1_context.linear.weight", t_swap_halves_lin
            return f"{b}.norm1_context.linear.bias", t_swap_halves_bias
        return f"{b}.norm1_context.linear.{suff}", tf_lin
    table = {"img_q": "attn.to_q", "img_k": "attn.to_k", "img_v": "attn.to_v",
             "txt_q": "attn.add_q_proj", "txt_k": "attn.add_k_proj",
             "txt_v": "attn.add_v_proj",
             "img_proj": "attn.to_out.0", "txt_proj": "attn.to_add_out",
             "img_fc1": "ff.net.0.proj", "img_fc2": "ff.net.2",
             "txt_fc1": "ff_context.net.0.proj", "txt_fc2": "ff_context.net.2",
             "img_qn": "attn.norm_q", "img_kn": "attn.norm_k",
             "txt_qn": "attn.norm_added_q", "txt_kn": "attn.norm_added_k"}
    if sub in table:
        if sub.endswith(("_qn", "_kn")):
            return f"{b}.{table[sub]}.weight", t_id
        return f"{b}.{table[sub]}.{suff}", tf_lin
    raise KeyError(f"unmapped MMDiT param {'/'.join(path)}")


def convert_mmdit(our_tree, state: Mapping[str, Any]):
    """SD3Transformer2DModel → our MMDiT. Reshapes the stored positional
    grid (1, max², D) into our (max, max, D) param."""
    params = our_tree["params"] if "params" in our_tree else our_tree
    last = max(int(k.split("_")[1]) for k in params if k.startswith("block_"))
    mh = params["pos_emb"].shape[0]

    def key_fn(path):
        p = [q for q in path if q != "params"]
        if p[0] == "pos_emb":
            return "pos_embed.pos_embed", \
                lambda w: np.asarray(w)[0].reshape(mh, mh, -1)
        return _mmdit_key(path, last)

    return _convert(our_tree, key_fn, state)


# ---- Flux (diffusers FluxTransformer2DModel) --------------------------------

def t_cat_linear(*ws):
    """Concat torch Linears along out-features, then → Flax kernel."""
    return np.transpose(np.concatenate([np.asarray(w) for w in ws], axis=0))


def t_cat_bias(*ws):
    return np.concatenate([np.asarray(w) for w in ws], axis=0)


def _flux_key(path: tuple[str, ...]):
    """Our Flux param path → diffusers FluxTransformer2DModel key(s).

    Fused projections map to tuples: our per-stream `*_qkv` Dense =
    concat(to_q,to_k,to_v); single-block `linear1` = concat(to_q,to_k,to_v,
    proj_mlp), `linear2` = proj_out. norm_out is AdaLayerNormContinuous
    (scale‖shift) → swapped into our shift-first final_mod.
    """
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    tf_lin = t_linear if leaf == "kernel" else t_id
    w_or_b = "weight" if leaf == "kernel" else "bias"

    top = {"img_in": "x_embedder", "txt_in": "context_embedder",
           "t_fc1": "time_text_embed.timestep_embedder.linear_1",
           "t_fc2": "time_text_embed.timestep_embedder.linear_2",
           "g_fc1": "time_text_embed.guidance_embedder.linear_1",
           "g_fc2": "time_text_embed.guidance_embedder.linear_2",
           "p_fc1": "time_text_embed.text_embedder.linear_1",
           "p_fc2": "time_text_embed.text_embedder.linear_2",
           "final_out": "proj_out"}
    if name in top:
        return f"{top[name]}.{w_or_b}", tf_lin
    if name == "final_mod":
        if leaf == "kernel":
            return "norm_out.linear.weight", t_swap_halves_lin
        return "norm_out.linear.bias", t_swap_halves_bias

    m = re.match(r"double_(\d+)$", name)
    if m:
        b = f"transformer_blocks.{m[1]}"
        sub = p[1]
        if sub == "img_mod":
            return f"{b}.norm1.linear.{w_or_b}", tf_lin
        if sub == "txt_mod":
            return f"{b}.norm1_context.linear.{w_or_b}", tf_lin
        if sub in ("img_qkv", "txt_qkv"):
            pre = "" if sub == "img_qkv" else "add_"
            post = "" if sub == "img_qkv" else "_proj"
            keys = tuple(f"{b}.attn.{pre}{x}{post}.{w_or_b}"
                         for x in ("to_q", "to_k", "to_v")) \
                if sub == "img_qkv" else tuple(
                    f"{b}.attn.add_{x}_proj.{w_or_b}" for x in ("q", "k", "v"))
            return keys, (t_cat_linear if leaf == "kernel" else t_cat_bias)
        table = {"img_o": "attn.to_out.0", "txt_o": "attn.to_add_out",
                 "img_fc1": "ff.net.0.proj", "img_fc2": "ff.net.2",
                 "txt_fc1": "ff_context.net.0.proj",
                 "txt_fc2": "ff_context.net.2"}
        if sub in table:
            return f"{b}.{table[sub]}.{w_or_b}", tf_lin
        norms = {"img_qn": "attn.norm_q", "img_kn": "attn.norm_k",
                 "txt_qn": "attn.norm_added_q", "txt_kn": "attn.norm_added_k"}
        if sub in norms:
            return f"{b}.{norms[sub]}.weight", t_id
        raise KeyError(f"unmapped Flux double param {'/'.join(path)}")

    m = re.match(r"single_(\d+)$", name)
    if m:
        b = f"single_transformer_blocks.{m[1]}"
        sub = p[1]
        if sub == "mod":
            return f"{b}.norm.linear.{w_or_b}", tf_lin
        if sub == "linear1":
            keys = (f"{b}.attn.to_q.{w_or_b}", f"{b}.attn.to_k.{w_or_b}",
                    f"{b}.attn.to_v.{w_or_b}", f"{b}.proj_mlp.{w_or_b}")
            return keys, (t_cat_linear if leaf == "kernel" else t_cat_bias)
        if sub == "linear2":
            return f"{b}.proj_out.{w_or_b}", tf_lin
        if sub in ("qn", "kn"):
            return f"{b}.attn.norm_{'q' if sub == 'qn' else 'k'}.weight", t_id
        raise KeyError(f"unmapped Flux single param {'/'.join(path)}")
    raise KeyError(f"unmapped Flux param {'/'.join(path)}")


def convert_flux(our_tree, state: Mapping[str, Any]):
    return _convert2(our_tree, _flux_key, state)


# ---- IP-Adapter (h94/IP-Adapter .bin: image_proj + ip_adapter groups) ------

def _flatten_groups(state: Mapping[str, Any]) -> dict[str, Any]:
    """IP-Adapter bins nest {'image_proj': {...}, 'ip_adapter': {...}};
    flatten to dotted keys (no-op for already-flat dicts)."""
    out = {}
    for k, v in state.items():
        if isinstance(v, Mapping):
            for k2, v2 in v.items():
                out[f"{k}.{k2}"] = v2
        else:
            out[k] = v
    return out


def convert_image_projection(our_tree, state: Mapping[str, Any]):
    """ImageProjProcessor of plain IP-Adapter(-XL): image_proj.{proj,norm}."""
    st = _flatten_groups(state)

    def key_fn(path):
        p = [q for q in path if q != "params"]
        name, leaf = p[0], p[-1]
        suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
        if name == "proj":
            return f"image_proj.proj.{suff}", \
                (t_linear if leaf == "kernel" else t_id)
        if name == "norm":
            return f"image_proj.norm.{suff}", t_id
        raise KeyError(f"unmapped ImageProjection param {'/'.join(path)}")
    return _convert(our_tree, key_fn, st)


def convert_ip_adapter_weights(our_tree, state: Mapping[str, Any],
                               site_names: tuple[str, ...]):
    """Per-site decoupled K/V. The checkpoint's `ip_adapter` group is keyed
    by the diffusers attn-processor ModuleList index (self-attns hold no
    params → cross sites land at odd indices 1,3,5,… in enumeration order
    down→mid→up, which `cross_attn_sites` reproduces)."""
    st = _flatten_groups(state)
    order = {name.replace(".", "__"): i for i, name in enumerate(site_names)}

    def key_fn(path):
        p = [q for q in path if q != "params"]
        name = p[0]                      # e.g. "down_1__tf_0__tb0__cross_k"
        safe, kv = name.rsplit("_", 1)
        idx = 2 * order[safe] + 1
        return f"ip_adapter.{idx}.to_{kv}_ip.weight", t_linear
    return _convert(our_tree, key_fn, st)


def convert_resampler(our_tree, state: Mapping[str, Any]):
    """IP-Adapter-Plus perceiver (reference resampler.py naming):
    layers.{i}.0 = PerceiverAttention(norm1,norm2,to_q,to_kv,to_out),
    layers.{i}.1 = FF Sequential(LayerNorm, Linear, GELU, Linear)."""
    st = _flatten_groups(state)

    def key_fn(path):
        import re
        p = [q for q in path if q != "params"]
        name, leaf = p[0], p[-1]
        if name == "latents":
            return "image_proj.latents", lambda w: np.asarray(w)[0]
        suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
        tf_lin = t_linear if leaf == "kernel" else t_id
        top = {"in_proj": "proj_in", "out_proj": "proj_out",
               "out_norm": "norm_out"}
        if name in top:
            tf = t_id if name == "out_norm" else tf_lin
            return f"image_proj.{top[name]}.{suff}", tf
        m = re.match(r"(norm1|norm2|q|kv|o|ffln|ff1|ff2)_(\d+)$", name)
        if not m:
            raise KeyError(f"unmapped Resampler param {'/'.join(path)}")
        kind, i = m[1], m[2]
        base = f"image_proj.layers.{i}"
        table = {"norm1": (f"{base}.0.norm1.{suff}", t_id),
                 "norm2": (f"{base}.0.norm2.{suff}", t_id),
                 "q": (f"{base}.0.to_q.{suff}", tf_lin),
                 "kv": (f"{base}.0.to_kv.{suff}", tf_lin),
                 "o": (f"{base}.0.to_out.{suff}", tf_lin),
                 "ffln": (f"{base}.1.0.{suff}", t_id),
                 "ff1": (f"{base}.1.1.{suff}", tf_lin),
                 "ff2": (f"{base}.1.3.{suff}", tf_lin)}
        return table[kind]
    return _convert(our_tree, key_fn, st)


# ---- T5 decoder + BLIP-2 (HF Blip2ForConditionalGeneration) ----------------

def _t5_dec_key(path: tuple[str, ...]) -> tuple[str, Callable]:
    """Our T5Decoder param path → HF t5 decoder key."""
    import re
    p = [q for q in path if q != "params"]
    name = p[0]
    lin = lambda k: (k + ".weight", t_linear)
    if name == "emb":
        return "shared.weight", t_id
    if name == "lm_head":
        return "lm_head.weight", t_linear
    if name == "ln_final":
        return "decoder.final_layer_norm.weight", t_id
    m = re.match(r"(ln_a|ln_x|ln_f|self|cross|ffn)_(\d+)$", name)
    if m:
        kind, i = m[1], m[2]
        blk = f"decoder.block.{i}.layer"
        if kind == "ln_a":
            return f"{blk}.0.layer_norm.weight", t_id
        if kind == "ln_x":
            return f"{blk}.1.layer_norm.weight", t_id
        if kind == "ln_f":
            return f"{blk}.2.layer_norm.weight", t_id
        if kind == "self":
            sub = p[1]
            if sub == "rel_bias":
                return (f"{blk}.0.SelfAttention.relative_attention_bias.weight",
                        t_id)
            return lin(f"{blk}.0.SelfAttention.{sub}")
        if kind == "cross":
            return lin(f"{blk}.1.EncDecAttention.{p[1]}")
        if kind == "ffn":
            mm = {"wi0": "wi_0", "wi1": "wi_1", "wo": "wo"}
            return lin(f"{blk}.2.DenseReluDense.{mm[p[1]]}")
    raise KeyError(f"unmapped T5-decoder param {'/'.join(path)}")


def convert_t5_decoder(our_tree, hf_state: Mapping[str, Any]):
    return _convert(our_tree, _t5_dec_key, hf_state)


def _eva_key(path: tuple[str, ...]) -> tuple[str, Callable]:
    """Our CLIPVisionEncoder (pre_ln=False EVA variant) → HF
    Blip2VisionModel keys (vision_model.*): fused self_attn.qkv split into
    to_q/to_k/to_v (k-bias is stored as zeros in the fused bias)."""
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf)
    pre = "vision_model"
    if name == "cls":
        return f"{pre}.embeddings.class_embedding", \
            lambda w: np.asarray(w).reshape(-1)
    if name == "pos_emb":
        return f"{pre}.embeddings.position_embedding", \
            lambda w: np.asarray(w)[0]
    if name == "patch_emb":
        return f"{pre}.embeddings.patch_embedding.{suff}", \
            (t_conv if leaf == "kernel" else t_id)
    if name == "post_ln":
        return f"{pre}.post_layernorm.{suff}", t_id
    m = re.match(r"block_(\d+)$", name)
    if m:
        b = f"{pre}.encoder.layers.{m[1]}"
        sub = p[1]
        if sub in ("ln1", "ln2"):
            return f"{b}.layer_norm{sub[-1]}.{suff}", t_id
        if sub == "attn":
            s2 = p[2]
            if s2 == "to_out":
                return f"{b}.self_attn.projection.{suff}", \
                    (t_linear if leaf == "kernel" else t_id)
            idx = {"to_q": 0, "to_k": 1, "to_v": 2}[s2]
            return f"{b}.self_attn.qkv.{suff}", _split3(idx, leaf)
        if sub in ("fc1", "fc2"):
            return f"{b}.mlp.{sub}.{suff}", \
                (t_linear if leaf == "kernel" else t_id)
    raise KeyError(f"unmapped EVA param {'/'.join(path)}")


def convert_eva_vit(our_tree, state: Mapping[str, Any]):
    return _convert(our_tree, _eva_key, state)


def _qformer_key(path: tuple[str, ...]) -> tuple[str, Callable]:
    """Our QFormer param path → HF blip2 qformer keys."""
    import re
    p = [q for q in path if q != "params"]
    name, leaf = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(leaf)
    tf_lin = t_linear if leaf == "kernel" else t_id
    if name == "queries":
        return "query_tokens", lambda w: np.asarray(w)[0]
    if name == "ln_in":
        return f"qformer.layernorm.{suff}", t_id
    if name == "lm_proj":
        return f"language_projection.{suff}", tf_lin
    m = re.match(r"block_(\d+)$", name)
    if m:
        b = f"qformer.encoder.layer.{m[1]}"
        table = {
            "sq": (f"{b}.attention.attention.query.{suff}", tf_lin),
            "sk": (f"{b}.attention.attention.key.{suff}", tf_lin),
            "sv": (f"{b}.attention.attention.value.{suff}", tf_lin),
            "so": (f"{b}.attention.output.dense.{suff}", tf_lin),
            "ln_sa": (f"{b}.attention.output.LayerNorm.{suff}", t_id),
            "cq": (f"{b}.crossattention.attention.query.{suff}", tf_lin),
            "ck": (f"{b}.crossattention.attention.key.{suff}", tf_lin),
            "cv": (f"{b}.crossattention.attention.value.{suff}", tf_lin),
            "co": (f"{b}.crossattention.output.dense.{suff}", tf_lin),
            "ln_ca": (f"{b}.crossattention.output.LayerNorm.{suff}", t_id),
            "fc1": (f"{b}.intermediate_query.dense.{suff}", tf_lin),
            "fc2": (f"{b}.output_query.dense.{suff}", tf_lin),
            "ln_ff": (f"{b}.output_query.LayerNorm.{suff}", t_id),
        }
        return table[p[1]]
    raise KeyError(f"unmapped QFormer param {'/'.join(path)}")


def convert_blip2(our_tree, state: Mapping[str, Any]):
    """Full Blip2VQA tree (qformer ⊕ T5 encoder ⊕ T5 decoder) from one
    Blip2ForConditionalGeneration state dict. The language model lives
    under `language_model.*`."""
    params = our_tree["params"] if "params" in our_tree else our_tree

    def key_fn(path):
        p = [q for q in path if q != "params"]
        if p[0] == "qformer":
            return _qformer_key(tuple(p[1:]))
        if p[0] == "encoder":
            k, tf = _t5_key(tuple(p[1:]))
            return f"language_model.{k}", tf
        if p[0] == "decoder":
            k, tf = _t5_dec_key(tuple(p[1:]))
            return f"language_model.{k}", tf
        raise KeyError(f"unmapped Blip2VQA param {'/'.join(p)}")

    return _convert(our_tree, key_fn, state)


# ---- UperNet-Swin segmenter (HF UperNetForSemanticSegmentation) ------------
# Reference capability: the vendored UniFormer mmseg segmentor runs ONE
# ADE20K UperNet checkpoint for img2seg (visual_condition_tool.py:137-143).
# We rebuild the segmenter as UperNet-on-Swin and convert the public
# openmmlab/upernet-swin-* checkpoints (HF transformers naming). All
# BatchNorms are folded into their convs at conversion time — the model is
# inference-only, so the folded form is exact and saves a fused op per
# ConvModule on TPU.

def _bn_fold(st: Mapping[str, Any], conv_key: str, bn_key: str,
             eps: float = 1e-5):
    """(folded flax kernel, folded bias) for a ConvModule (conv+BN+ReLU)."""
    w = np.asarray(st[f"{conv_key}.weight"], np.float32)
    g = np.asarray(st[f"{bn_key}.weight"], np.float32)
    b = np.asarray(st[f"{bn_key}.bias"], np.float32)
    m = np.asarray(st[f"{bn_key}.running_mean"], np.float32)
    v = np.asarray(st[f"{bn_key}.running_var"], np.float32)
    scale = g / np.sqrt(v + eps)
    kern = np.transpose(w, (2, 3, 1, 0)) * scale      # (kh,kw,I,O)·O
    bias = b - m * scale
    if f"{conv_key}.bias" in st:                      # rare: conv WITH bias
        bias = bias + np.asarray(st[f"{conv_key}.bias"], np.float32) * scale
    return kern, bias


def _swin_hf_leaf(st: Mapping[str, Any], prefix: str, p: list):
    """One leaf of our SwinTransformer tree ← HF Swin naming under
    `{prefix}.` (shared by the UperNet segmenter and GroundingDINO's HF
    checkpoint layout): fused qkv ← split query/key/value."""
    import re
    name, ln = p[0], p[-1]
    suff = {"kernel": "weight", "scale": "weight", "bias": "bias",
            "embedding": "weight"}.get(ln, "weight")
    if name == "patch_embed":
        return t_conv(st[f"{prefix}.embeddings.patch_embeddings."
                         f"projection.{suff}"]) if ln == "kernel" \
            else np.asarray(st[f"{prefix}.embeddings.patch_embeddings."
                               "projection.bias"])
    if name == "patch_ln":
        return np.asarray(st[f"{prefix}.embeddings.norm.{suff}"])
    m = re.match(r"out_ln(\d+)$", name)
    if m:
        return np.asarray(
            st[f"{prefix}.hidden_states_norms.stage{int(m[1]) + 1}.{suff}"])
    m = re.match(r"merge_ln(\d+)$", name)
    if m:
        return np.asarray(st[f"{prefix}.encoder.layers.{m[1]}."
                             f"downsample.norm.{suff}"])
    m = re.match(r"merge_fc(\d+)$", name)
    if m:
        return t_linear(st[f"{prefix}.encoder.layers.{m[1]}."
                           f"downsample.reduction.weight"])
    m = re.match(r"stage(\d+)_block(\d+)$", name)
    if m:
        blk = f"{prefix}.encoder.layers.{m[1]}.blocks.{m[2]}"
        sub = p[1]
        if sub == "ln1":
            return np.asarray(st[f"{blk}.layernorm_before.{suff}"])
        if sub == "ln2":
            return np.asarray(st[f"{blk}.layernorm_after.{suff}"])
        if sub == "rel_bias":
            return np.asarray(
                st[f"{blk}.attention.self.relative_position_bias_table"])
        if sub == "qkv":
            parts = [st[f"{blk}.attention.self.{n}.{suff}"]
                     for n in ("query", "key", "value")]
            if ln == "kernel":
                return np.concatenate([t_linear(w) for w in parts], 1)
            return np.concatenate([np.asarray(b) for b in parts], 0)
        if sub == "proj":
            return t_linear(st[f"{blk}.attention.output.dense.weight"]) \
                if ln == "kernel" \
                else np.asarray(st[f"{blk}.attention.output.dense.bias"])
        if sub in ("mlp1", "mlp2"):
            hf = "intermediate.dense" if sub == "mlp1" else "output.dense"
            return t_linear(st[f"{blk}.{hf}.weight"]) if ln == "kernel" \
                else np.asarray(st[f"{blk}.{hf}.bias"])
    raise KeyError(f"unmapped swin param {'/'.join(p)}")


def convert_upernet_swin(our_tree, st: Mapping[str, Any]):
    """UperNetSegmenter ← HF `UperNetForSemanticSegmentation` (Swin
    backbone). Split q/k/v fuse into our qkv; ConvModule BNs fold; the
    training-only auxiliary FCN head is ignored."""
    params = our_tree["params"] if "params" in our_tree else our_tree
    import re

    def swin_leaf(p: list[str], leaf):
        return _swin_hf_leaf(st, "backbone", p)

    def head_leaf(p: list[str], leaf):
        name, ln = p[0], p[-1]
        table = {"ppm_out": "decode_head.bottleneck",
                 "fuse": "decode_head.fpn_bottleneck"}
        m = re.match(r"ppm_(\d+)$", name)
        if m:
            table[name] = f"decode_head.psp_modules.{m[1]}.1"
        m = re.match(r"lat_(\d+)$", name)
        if m:
            table[name] = f"decode_head.lateral_convs.{m[1]}"
        m = re.match(r"fpn_(\d+)$", name)
        if m:
            table[name] = f"decode_head.fpn_convs.{m[1]}"
        if name in table:
            base = table[name]
            kern, bias = _bn_fold(st, f"{base}.conv", f"{base}.batch_norm")
            return kern if ln == "kernel" else bias
        if name == "cls":
            return t_conv(st["decode_head.classifier.weight"]) \
                if ln == "kernel" \
                else np.asarray(st["decode_head.classifier.bias"])
        raise KeyError(f"unmapped upernet head param {'/'.join(p)}")

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        p = [q for q in path if q != "params"]
        val = swin_leaf(p[1:], node) if p[0] == "backbone" \
            else head_leaf(p[1:], node)
        val = np.asarray(val)
        if tuple(val.shape) != tuple(np.shape(node)):
            raise ValueError(f"{'/'.join(p)}: {val.shape} vs {np.shape(node)}")
        return val

    return walk(params, ())


# ---- GOT-OCR2 (HF GotOcr2ForConditionalGeneration) -------------------------

def convert_got_ocr(our_tree, st: Mapping[str, Any]):
    """GotOCR ← stepfun-ai/GOT-OCR2_0 via HF naming: SAM-ViT-B vision tower
    (`model.vision_tower.*`), conv projector (`model.multi_modal_projector.*`),
    Qwen2 LM (`model.language_model.*` + top-level tied `lm_head.weight`)."""
    params = our_tree["params"] if "params" in our_tree else our_tree
    import re

    def vis_leaf(p, leaf):
        name, ln = p[0], p[-1]
        pre = "model.vision_tower"
        if name == "patch_embed":
            return t_conv(st[f"{pre}.patch_embed.projection.weight"]) \
                if ln == "kernel" \
                else np.asarray(st[f"{pre}.patch_embed.projection.bias"])
        if name == "pos_emb":
            return np.asarray(st[f"{pre}.pos_embed"])[0]
        neck = {"neck1": "conv1", "neck_ln1": "layer_norm1",
                "neck2": "conv2", "neck_ln2": "layer_norm2"}
        if name in neck:
            k = f"{pre}.neck.{neck[name]}"
            return t_conv(st[f"{k}.weight"]) if ln == "kernel" \
                else np.asarray(st[f"{k}.{'weight' if ln == 'scale' else 'bias'}"])
        m = re.match(r"block_(\d+)$", name)
        if m:
            blk = f"{pre}.layers.{m[1]}"
            sub = p[1]
            lnorm = {"ln1": "layer_norm1", "ln2": "layer_norm2"}
            if sub in lnorm:
                return np.asarray(st[f"{blk}.{lnorm[sub]}."
                                     f"{'weight' if ln == 'scale' else 'bias'}"])
            if sub in ("rel_h", "rel_w"):
                return np.asarray(st[f"{blk}.attn.rel_pos_"
                                     f"{'h' if sub == 'rel_h' else 'w'}"])
            hf = {"qkv": "attn.qkv", "proj": "attn.proj",
                  "mlp1": "mlp.lin1", "mlp2": "mlp.lin2"}[sub]
            return t_linear(st[f"{blk}.{hf}.weight"]) if ln == "kernel" \
                else np.asarray(st[f"{blk}.{hf}.bias"])
        raise KeyError(f"unmapped GOT vision param {'/'.join(p)}")

    def lm_leaf(p, leaf):
        name, ln = p[0], p[-1]
        pre = "model.language_model"
        if name == "tok":
            return np.asarray(st[f"{pre}.embed_tokens.weight"])
        if name == "norm_f":
            return np.asarray(st[f"{pre}.norm.weight"])
        if name == "lm_head":
            # tied in GOT; the state dict carries the tensor explicitly
            return t_linear(st["lm_head.weight"])
        m = re.match(r"layer_(\d+)$", name)
        if m:
            blk = f"{pre}.layers.{m[1]}"
            hf = {"wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
                  "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
                  "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
                  "w_down": "mlp.down_proj",
                  "attn_norm": "input_layernorm",
                  "mlp_norm": "post_attention_layernorm"}[p[1]]
            if p[1] in ("attn_norm", "mlp_norm"):
                return np.asarray(st[f"{blk}.{hf}.weight"])
            return t_linear(st[f"{blk}.{hf}.weight"]) if ln == "kernel" \
                else np.asarray(st[f"{blk}.{hf}.bias"])
        raise KeyError(f"unmapped GOT lm param {'/'.join(p)}")

    def leaf(p, node):
        name = p[0]
        if name == "vision":
            return vis_leaf(p[1:], node)
        if name == "lm":
            return lm_leaf(p[1:], node)
        mm = "model.multi_modal_projector"
        if name in ("up1", "up2"):
            n = "conv_upsampler1" if name == "up1" else "conv_upsampler2"
            return t_conv(st[f"{mm}.{n}.weight"])
        if name == "mm_proj":
            return t_linear(st[f"{mm}.multimodal_projector.weight"]) \
                if p[-1] == "kernel" \
                else np.asarray(st[f"{mm}.multimodal_projector.bias"])
        raise KeyError(f"unmapped GOT param {'/'.join(p)}")

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        p = [q for q in path if q != "params"]
        val = np.asarray(leaf(p, node))
        if tuple(val.shape) != tuple(np.shape(node)):
            raise ValueError(f"{'/'.join(p)}: {val.shape} vs {np.shape(node)}")
        return val

    return walk(params, ())


# ---- VILA / llava VQA judge (HF LlavaForConditionalGeneration) -------------

def convert_vila(our_tree, st: Mapping[str, Any]):
    """VilaVQA ← llava-1.5-family checkpoints (HF naming). The reference's
    VILA (other_modules/vila) is the same llava composition — CLIP tower
    (feature layer -2: our tower omits the final block, so those weights
    are simply skipped), 2-layer GELU projector, Llama decoder. lm_head is
    top-level; the LM sits under `model.language_model.`."""
    def key_fn(path):
        p = [q for q in path if q != "params"]
        if p[0] == "vision":
            k, tf = _clip_vision_key(tuple(p[1:]))
            return f"model.vision_tower.{k}", tf
        if p[0] == "projector":
            name, leaf = p[1], p[-1]
            suff = "weight" if leaf == "kernel" else "bias"
            n = "linear_1" if name == "fc1" else "linear_2"
            return (f"model.multi_modal_projector.{n}.{suff}",
                    t_linear if leaf == "kernel" else t_id)
        if p[0] == "lm":
            k, tf = _llama_key(tuple(p[1:]))
            if k == "lm_head.weight":
                return k, tf
            assert k.startswith("model.")
            return f"model.language_model.{k[len('model.'):]}", tf
        raise KeyError(f"unmapped VILA param {'/'.join(p)}")

    return _convert(our_tree, key_fn, st)


# ---- GroundingDINO via HF transformers naming ------------------------------

def convert_gdino_hf(our_tree, st: Mapping[str, Any]):
    """GroundingDINO ← HF `GroundingDinoForObjectDetection` naming (e.g.
    IDEA-Research/grounding-dino-*). Complements `convert_gdino` (original
    repo naming); also the vehicle for the full-model golden parity test."""
    params = our_tree["params"] if "params" in our_tree else our_tree
    import re

    def mlp_head(base, sub, ln):
        i = {"fc1": 0, "fc2": 1, "fc3": 2}[sub]
        k = f"{base}.layers.{i}.{'weight' if ln == 'kernel' else 'bias'}"
        return t_linear(st[k]) if ln == "kernel" else np.asarray(st[k])

    def attn_qkvo(base, sub, ln, names=("query", "key", "value", "out_proj")):
        n = dict(zip(("q", "k", "v", "o"), names))[sub]
        k = f"{base}.{n}.{'weight' if ln == 'kernel' else 'bias'}"
        return t_linear(st[k]) if ln == "kernel" else np.asarray(st[k])

    def deform(base, sub, ln):
        hf = {"value_proj": "value_proj", "sampling_offsets":
              "sampling_offsets", "attn_weights": "attention_weights",
              "out_proj": "output_proj"}[sub]
        k = f"{base}.{hf}.{'weight' if ln == 'kernel' else 'bias'}"
        return t_linear(st[k]) if ln == "kernel" else np.asarray(st[k])

    def lnorm(base, ln):
        return np.asarray(st[f"{base}.{'weight' if ln == 'scale' else 'bias'}"])

    def ffn(base, p, ln, names=("fc1", "fc2", "final_layer_norm")):
        sub = p[0]
        if sub == "ln":
            return lnorm(f"{base}.{names[2]}", ln)
        k = f"{base}.{names[0] if sub == 'fc1' else names[1]}." \
            f"{'weight' if ln == 'kernel' else 'bias'}"
        return t_linear(st[k]) if ln == "kernel" else np.asarray(st[k])

    def leaf(p, node):
        name, ln = p[0], p[-1]
        if name == "bert":
            k, tf = _bert_key(tuple(p[1:]), prefix="model.text_backbone.")
            return tf(st[k])
        if name == "swin":
            return _swin_hf_leaf(st, "model.backbone.conv_encoder.model",
                                 p[1:])
        if name == "feat_map":
            k = f"model.text_projection.{'weight' if ln == 'kernel' else 'bias'}"
            return t_linear(st[k]) if ln == "kernel" else np.asarray(st[k])
        m = re.match(r"in_proj_(\d+)$", name)
        if m:
            k = f"model.input_proj_vision.{m[1]}.0." \
                f"{'weight' if ln == 'kernel' else 'bias'}"
            return t_conv(st[k]) if ln == "kernel" else np.asarray(st[k])
        m = re.match(r"in_ln_(\d+)$", name)
        if m:
            return lnorm(f"model.input_proj_vision.{m[1]}.1", ln)
        if name == "level_embed":
            return np.asarray(st["model.level_embed"])
        if name == "tgt_embed":
            return np.asarray(st["model.query_position_embeddings.weight"])
        if name == "mem_proj":
            k = f"model.enc_output.{'weight' if ln == 'kernel' else 'bias'}"
            return t_linear(st[k]) if ln == "kernel" else np.asarray(st[k])
        if name == "mem_ln":
            return lnorm("model.enc_output_norm", ln)
        if name == "enc_box_head":
            return mlp_head("model.encoder_output_bbox_embed", p[1], ln)
        m = re.match(r"dec_box_head_(\d+)$", name)
        if m:
            return mlp_head(f"bbox_embed.{m[1]}", p[1], ln)
        m = re.match(r"ref_point_fc(\d)$", name)
        if m:
            i = int(m[1]) - 1
            k = f"model.decoder.reference_points_head.layers.{i}." \
                f"{'weight' if ln == 'kernel' else 'bias'}"
            return t_linear(st[k]) if ln == "kernel" else np.asarray(st[k])
        if name == "dec_norm":
            return lnorm("model.decoder.layer_norm", ln)
        m = re.match(r"enc_(\d+)$", name)
        if m:
            base = f"model.encoder.layers.{m[1]}"
            sub = p[1]
            if sub == "fusion":
                fb = f"{base}.fusion_layer"
                s2 = p[2]
                table = {"qi": "vision_proj", "kt": "text_proj",
                         "vt": "values_text_proj", "vi": "values_vision_proj",
                         "oi": "out_vision_proj", "ot": "out_text_proj"}
                if s2 in table:
                    k = f"{fb}.attn.{table[s2]}." \
                        f"{'weight' if ln == 'kernel' else 'bias'}"
                    return t_linear(st[k]) if ln == "kernel" \
                        else np.asarray(st[k])
                if s2 == "ln_i":
                    return lnorm(f"{fb}.layer_norm_vision", ln)
                if s2 == "ln_t":
                    return lnorm(f"{fb}.layer_norm_text", ln)
                if s2 == "gamma_i":
                    return np.asarray(st[f"{fb}.vision_param"])
                if s2 == "gamma_t":
                    return np.asarray(st[f"{fb}.text_param"])
            if sub in ("tq", "tk", "tv", "to"):
                return attn_qkvo(f"{base}.text_enhancer_layer.self_attn",
                                 sub[1], ln)
            if sub == "txt_ln":
                return lnorm(f"{base}.text_enhancer_layer.layer_norm_before",
                             ln)
            if sub == "txt_ffn":
                return ffn(f"{base}.text_enhancer_layer", p[2:], ln,
                           names=("fc1", "fc2", "layer_norm_after"))
            if sub == "deform":
                return deform(f"{base}.deformable_layer.self_attn", p[2], ln)
            if sub == "img_ln":
                return lnorm(f"{base}.deformable_layer.self_attn_layer_norm",
                             ln)
            if sub == "img_ffn":
                return ffn(f"{base}.deformable_layer", p[2:], ln)
        m = re.match(r"dec_(\d+)$", name)
        if m:
            base = f"model.decoder.layers.{m[1]}"
            sub = p[1]
            if sub in ("sq", "sk", "sv", "so"):
                return attn_qkvo(f"{base}.self_attn", sub[1], ln)
            if sub == "ln_sa":
                return lnorm(f"{base}.self_attn_layer_norm", ln)
            if sub in ("cq", "ck", "cv", "co"):
                return attn_qkvo(f"{base}.encoder_attn_text", sub[1], ln)
            if sub == "ln_ta":
                return lnorm(f"{base}.encoder_attn_text_layer_norm", ln)
            if sub == "deform":
                return deform(f"{base}.encoder_attn", p[2], ln)
            if sub == "ln_da":
                return lnorm(f"{base}.encoder_attn_layer_norm", ln)
            if sub == "ffn":
                return ffn(base, p[2:], ln)
        raise KeyError(f"unmapped GDINO-HF param {'/'.join(p)}")

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        p = [q for q in path if q != "params"]
        val = np.asarray(leaf(p, node))
        if tuple(val.shape) != tuple(np.shape(node)):
            raise ValueError(f"{'/'.join(p)}: {val.shape} vs {np.shape(node)}")
        return val

    return walk(params, ())


# ---- HF-naming adapters for alternate checkpoint sources ----------------
# The setup.sh checkpoints for SAM / DepthAnything ship in the ORIGINAL
# repo naming that convert_sam / convert_depth_anything consume; these
# renamers let the same converters (and `convert --verify`) ingest the HF
# mirrors (facebook/sam-vit-huge, depth-anything/...-hf) too.

def hf_sam_to_original(st: Mapping[str, Any]) -> dict:
    """Rename HF SamModel keys to the original SAM checkpoint naming."""
    import re
    out = {}
    for k, v in st.items():
        k = k.replace("vision_encoder.", "image_encoder.")
        k = k.replace("patch_embed.projection.", "patch_embed.proj.")
        m = re.match(r"image_encoder\.layers\.(\d+)\.(.*)", k)
        if m:
            rest = m[2].replace("layer_norm1", "norm1").replace(
                "layer_norm2", "norm2")
            k = f"image_encoder.blocks.{m[1]}.{rest}"
        k = k.replace("neck.conv1", "neck.0").replace(
            "neck.layer_norm1", "neck.1").replace(
            "neck.conv2", "neck.2").replace("neck.layer_norm2", "neck.3")
        k = k.replace("prompt_encoder.shared_embedding.positional_embedding",
                      "prompt_encoder.pe_layer."
                      "positional_encoding_gaussian_matrix")
        k = k.replace("prompt_encoder.point_embed.",
                      "prompt_encoder.point_embeddings.")
        k = re.sub(r"(transformer\.layers\.\d+\.)layer_norm(\d)",
                   r"\1norm\2", k)
        k = k.replace("transformer.layer_norm_final_attn",
                      "transformer.norm_final_attn")
        k = k.replace("upscale_conv1", "output_upscaling.0")
        k = k.replace("upscale_layer_norm", "output_upscaling.1")
        k = k.replace("upscale_conv2", "output_upscaling.3")
        # 3-layer MLP heads: HF (proj_in, layers.0, proj_out) → original
        # layers.(0,1,2). Shift the hidden layer FIRST, then the projs.
        head = r"((?:output_hypernetworks_mlps\.\d+|iou_prediction_head))"
        k = re.sub(head + r"\.layers\.0\.", r"\1.layers.1.", k)
        k = re.sub(head + r"\.proj_in\.", r"\1.layers.0.", k)
        k = re.sub(head + r"\.proj_out\.", r"\1.layers.2.", k)
        out[k] = v
    return out


def hf_depth_to_official(st: Mapping[str, Any], n_layers: int) -> dict:
    """Rename HF DepthAnythingForDepthEstimation keys (split q/k/v) to the
    official DA-V2 naming (fused qkv) that convert_depth_anything consumes."""
    import re
    out = {}
    for k, v in st.items():
        if ".attention.attention." in k:
            continue                       # fused below
        k2 = k
        k2 = k2.replace("backbone.embeddings.cls_token",
                        "pretrained.cls_token")
        k2 = k2.replace("backbone.embeddings.position_embeddings",
                        "pretrained.pos_embed")
        k2 = k2.replace("backbone.embeddings.patch_embeddings.projection",
                        "pretrained.patch_embed.proj")
        k2 = re.sub(r"backbone\.encoder\.layer\.(\d+)\.",
                    r"pretrained.blocks.\1.", k2)
        k2 = k2.replace(".attention.output.dense", ".attn.proj")
        k2 = k2.replace(".layer_scale1.lambda1", ".ls1.gamma")
        k2 = k2.replace(".layer_scale2.lambda1", ".ls2.gamma")
        k2 = k2.replace("backbone.layernorm", "pretrained.norm")
        m = re.match(r"neck\.reassemble_stage\.layers\.(\d+)\.projection\.(.*)", k2)
        if m:
            k2 = f"depth_head.projects.{m[1]}.{m[2]}"
        m = re.match(r"neck\.reassemble_stage\.layers\.(\d+)\.resize\.(.*)", k2)
        if m:
            k2 = f"depth_head.resize_layers.{m[1]}.{m[2]}"
        m = re.match(r"neck\.convs\.(\d+)\.(.*)", k2)
        if m:
            k2 = f"depth_head.scratch.layer{int(m[1]) + 1}_rn.{m[2]}"
        m = re.match(r"neck\.fusion_stage\.layers\.(\d+)\.(.*)", k2)
        if m:
            rn = 4 - int(m[1])             # fusion[0] = coarsest = refinenet4
            rest = m[2].replace("residual_layer1", "resConfUnit1") \
                       .replace("residual_layer2", "resConfUnit2") \
                       .replace("convolution1", "conv1") \
                       .replace("convolution2", "conv2") \
                       .replace("projection", "out_conv")
            k2 = f"depth_head.scratch.refinenet{rn}.{rest}"
        k2 = k2.replace("head.conv1", "depth_head.scratch.output_conv1")
        k2 = k2.replace("head.conv2", "depth_head.scratch.output_conv2.0")
        k2 = k2.replace("head.conv3", "depth_head.scratch.output_conv2.2")
        out[k2] = v
    for i in range(n_layers):
        pre = f"backbone.encoder.layer.{i}.attention.attention"
        for suf in ("weight", "bias"):
            out[f"pretrained.blocks.{i}.attn.qkv.{suf}"] = np.concatenate(
                [np.asarray(st[f"{pre}.{n}.{suf}"])
                 for n in ("query", "key", "value")], 0)
    return out
