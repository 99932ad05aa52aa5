"""`anyedit_tpu convert --verify` — checkpoint-time conversion parity.

The golden tests (tests/test_golden_hf.py) prove every converter against
randomly-initialized HF modules; what they cannot catch is a mis-mapping
whose random-init statistics are symmetric. This module closes that hole
the day real weights appear: given an HF model DIRECTORY as the source, it
instantiates the actual torch module (`from_pretrained`), derives OUR
config from the checkpoint's own config.json, converts the state dict with
the production converter, runs BOTH models on a fixed input, and reports
the max abs deviation — the msgpack is only written if parity holds.

Supported families are the transformers-backed towers (the diffusers
families have no torch runtime in this environment — their converters stay
covered by the structural every-tensor-consumed checks + golden tests).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.weights import convert as C


def _np_state(torch_model) -> dict:
    return {k: v.detach().cpu().numpy()
            for k, v in torch_model.state_dict().items()}


def _abstract(model, *args):
    return jax.eval_shape(model.init, jax.random.key(0), *args)["params"]


def _require_dir(src: str | Path, name: str) -> Path:
    p = Path(src)
    if not p.is_dir() or not (p / "config.json").exists():
        raise ValueError(
            f"--verify for {name!r} needs an HF model directory (with "
            f"config.json) as --src so the torch reference can run; got {p}")
    return p


def _verify_clip_text(src: str) -> float:
    import transformers
    from anyedit_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    d = _require_dir(src, "clip_text")
    hc = transformers.AutoConfig.from_pretrained(d)
    if hc.model_type == "clip":        # full CLIP config → text sub-config
        hc = hc.text_config
    # SDXL tower-2 / SD3 towers ship as CLIPTextModelWithProjection —
    # verify the projected pooled + penultimate hidden in that case.
    with_proj = "WithProjection" in (getattr(hc, "architectures", None)
                                     or [""])[0]
    cls = (transformers.CLIPTextModelWithProjection if with_proj
           else transformers.CLIPTextModel)
    hf = cls.from_pretrained(d).eval()
    hc = hf.config
    cfg = CLIPTextConfig(vocab_size=hc.vocab_size, hidden=hc.hidden_size,
                         layers=hc.num_hidden_layers,
                         heads=hc.num_attention_heads,
                         max_len=hc.max_position_embeddings,
                         activation=hc.hidden_act, dtype=jnp.float32,
                         text_proj=hc.projection_dim if with_proj else 0)
    ours = CLIPTextEncoder(cfg)
    ids = np.array([[min(9, cfg.vocab_size - 1), 1, 2,
                     cfg.vocab_size - 1]], np.int64)
    tree = {"params": C.convert_clip_text(
        _abstract(ours, jnp.asarray(ids, jnp.int32)), _np_state(hf))}
    hidden, pooled, penult = ours.apply(tree, jnp.asarray(ids, jnp.int32))
    import torch
    with torch.no_grad():
        out = hf(torch.from_numpy(ids), output_hidden_states=True)
    err = np.abs(np.asarray(hidden) - out.last_hidden_state.numpy()).max()
    err = max(err, np.abs(np.asarray(penult)
                          - out.hidden_states[-2].numpy()).max())
    if with_proj:
        err = max(err, np.abs(np.asarray(pooled)
                              - out.text_embeds.numpy()).max())
    return float(err)


def _verify_clip_vision(src: str) -> float:
    from transformers import CLIPVisionModelWithProjection
    from anyedit_tpu.models.clip import CLIPVisionConfig, CLIPVisionEncoder
    hf = CLIPVisionModelWithProjection.from_pretrained(
        _require_dir(src, "clip_vision")).eval()
    hc = hf.config
    cfg = CLIPVisionConfig(image_size=hc.image_size, patch=hc.patch_size,
                           hidden=hc.hidden_size,
                           layers=hc.num_hidden_layers,
                           heads=hc.num_attention_heads,
                           proj_dim=hc.projection_dim,
                           activation=hc.hidden_act, dtype=jnp.float32)
    ours = CLIPVisionEncoder(cfg)
    px = np.random.default_rng(0).standard_normal(
        (1, hc.image_size, hc.image_size, 3)).astype(np.float32)
    tree = {"params": C.convert_clip_vision(
        _abstract(ours, jnp.asarray(px)), _np_state(hf))}
    _, z = ours.apply(tree, jnp.asarray(px))
    import torch
    with torch.no_grad():
        want = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))).image_embeds.numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    return float(np.abs(np.asarray(z) - want).max())


def _verify_t5(src: str) -> float:
    from transformers import T5EncoderModel
    from anyedit_tpu.models.t5 import T5Config, T5Encoder
    hf = T5EncoderModel.from_pretrained(_require_dir(src, "t5")).eval()
    hc = hf.config
    cfg = T5Config(vocab_size=hc.vocab_size, dim=hc.d_model, kv_dim=hc.d_kv,
                   heads=hc.num_heads, ffn_dim=hc.d_ff,
                   enc_layers=hc.num_layers, dec_layers=0,
                   rel_buckets=hc.relative_attention_num_buckets,
                   rel_max_dist=hc.relative_attention_max_distance,
                   dtype=jnp.float32)
    ours = T5Encoder(cfg)
    ids = np.array([[5, 9, 1, 12, 3]], np.int64)
    tree = {"params": C.convert_t5_encoder(
        _abstract(ours, jnp.asarray(ids, jnp.int32)), _np_state(hf))}
    got = np.asarray(ours.apply(tree, jnp.asarray(ids, jnp.int32)))
    import torch
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    return float(np.abs(got - want).max())


def _verify_dinov2(src: str) -> float:
    from transformers import Dinov2Model
    from anyedit_tpu.models.dinov2 import DinoV2, DinoV2Config
    hf = Dinov2Model.from_pretrained(_require_dir(src, "dinov2")).eval()
    hc = hf.config
    cfg = DinoV2Config(img_size=hc.image_size, patch=hc.patch_size,
                       dim=hc.hidden_size, depth=hc.num_hidden_layers,
                       heads=hc.num_attention_heads,
                       layerscale_init=hc.layerscale_value,
                       dtype=jnp.float32)
    ours = DinoV2(cfg)
    px = np.random.default_rng(1).standard_normal(
        (1, hc.image_size, hc.image_size, 3)).astype(np.float32)
    tree = {"params": C.convert_dinov2(_abstract(ours, jnp.asarray(px)),
                                       _np_state(hf))}
    out = ours.apply(tree, jnp.asarray(px))
    import torch
    with torch.no_grad():
        want = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    err = np.abs(np.asarray(out["cls"]) - want[:, 0]).max()
    return float(max(err, np.abs(np.asarray(out["patch"]) - want[:, 1:]).max()))


def _verify_sam(src: str) -> float:
    from transformers import SamModel
    from anyedit_tpu.models.sam import SAM, SAMConfig
    hf = SamModel.from_pretrained(_require_dir(src, "sam")).eval()
    vc, mc = hf.config.vision_config, hf.config.mask_decoder_config
    cfg = SAMConfig(img_size=vc.image_size, patch=vc.patch_size,
                    enc_dim=vc.hidden_size, enc_depth=vc.num_hidden_layers,
                    enc_heads=vc.num_attention_heads,
                    window=vc.window_size,
                    global_attn_idx=tuple(vc.global_attn_indexes),
                    out_dim=vc.output_channels,
                    dec_depth=mc.num_hidden_layers,
                    dec_heads=mc.num_attention_heads, dtype=jnp.float32)
    ours = SAM(cfg)
    px = np.random.default_rng(2).standard_normal(
        (1, vc.image_size, vc.image_size, 3)).astype(np.float32)
    s = vc.image_size
    boxes = np.array([[[s * .1, s * .2, s * .7, s * .8]]], np.float32)
    st = C.hf_sam_to_original(_np_state(hf))
    st["prompt_encoder.box_corner_embeddings"] = np.stack(
        [np.asarray(st["prompt_encoder.point_embeddings.2.weight"])[0],
         np.asarray(st["prompt_encoder.point_embeddings.3.weight"])[0]])
    tree = {"params": C.convert_sam(
        _abstract(ours, jnp.asarray(px), jnp.asarray(boxes)), st)}
    masks, iou = ours.apply(tree, jnp.asarray(px), jnp.asarray(boxes))
    import torch
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                 input_boxes=torch.from_numpy(boxes.astype(np.float64)))
    err = np.abs(np.asarray(masks)[:, 1:4] - out.pred_masks.numpy()[0]).max()
    return float(max(err, np.abs(np.asarray(iou)[:, 1:4]
                                 - out.iou_scores.numpy()[0]).max()))


def _verify_depth(src: str) -> float:
    from transformers import DepthAnythingForDepthEstimation
    from anyedit_tpu.models.depth import DepthAnythingV2, DPTConfig
    from anyedit_tpu.models.dinov2 import DinoV2Config
    hf = DepthAnythingForDepthEstimation.from_pretrained(
        _require_dir(src, "depth")).eval()
    hc = hf.config
    bb = hc.backbone_config
    n = bb.num_hidden_layers
    take = tuple(i - 1 for i in (bb.out_indices if bb.out_indices
                                 else range(1, n + 1)))
    cfg = DPTConfig(
        backbone=DinoV2Config(img_size=bb.image_size, patch=bb.patch_size,
                              dim=bb.hidden_size, depth=n,
                              heads=bb.num_attention_heads,
                              dtype=jnp.float32),
        take_layers=take, out_channels=tuple(hc.neck_hidden_sizes),
        feat_dim=hc.fusion_hidden_size, dtype=jnp.float32)
    ours = DepthAnythingV2(cfg)
    px = np.random.default_rng(3).standard_normal(
        (1, bb.image_size, bb.image_size, 3)).astype(np.float32)
    st = C.hf_depth_to_official(_np_state(hf), n)
    tree = {"params": C.convert_depth_anything(
        _abstract(ours, jnp.asarray(px)), st)}
    got = np.asarray(ours.apply(tree, jnp.asarray(px)))
    import torch
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))
                  ).predicted_depth.numpy()
    return float(np.abs(got - want).max())


def _verify_gdino(src: str) -> float:
    from transformers import GroundingDinoForObjectDetection
    from anyedit_tpu.models.gdino import GroundingDINO, GDINOConfig
    from anyedit_tpu.models.swin import SwinConfig
    from anyedit_tpu.models.bert import BertConfig
    hf = GroundingDinoForObjectDetection.from_pretrained(
        _require_dir(src, "gdino")).eval()
    hc = hf.config
    sw, bt = hc.backbone_config, hc.text_config
    cfg = GDINOConfig(
        swin=SwinConfig(embed_dim=sw.embed_dim, depths=tuple(sw.depths),
                        heads=tuple(sw.num_heads), window=sw.window_size,
                        patch=sw.patch_size,
                        out_indices=tuple(range(len(sw.depths)))[-3:]
                        if len(sw.depths) >= 3 else
                        tuple(range(len(sw.depths))),
                        dtype=jnp.float32),
        bert=BertConfig(vocab_size=bt.vocab_size, hidden=bt.hidden_size,
                        layers=bt.num_hidden_layers,
                        heads=bt.num_attention_heads,
                        max_len=bt.max_position_embeddings,
                        type_vocab=bt.type_vocab_size, dtype=jnp.float32),
        hidden=hc.d_model, heads=hc.encoder_attention_heads,
        enc_layers=hc.encoder_layers, dec_layers=hc.decoder_layers,
        num_queries=hc.num_queries, num_levels=hc.num_feature_levels,
        num_points=hc.encoder_n_points, max_text_len=hc.max_text_len,
        ffn_dim=hc.encoder_ffn_dim, dtype=jnp.float32)
    ours = GroundingDINO(cfg)
    size = 16 * sw.patch_size                  # small but stride-aligned
    px = np.random.default_rng(4).standard_normal(
        (1, size, size, 3)).astype(np.float32)
    ids = np.array([[101, 5, 7, 1012, 102]], np.int64)
    mask = np.ones_like(ids, bool)
    tree = {"params": C.convert_gdino_hf(
        _abstract(ours, jnp.asarray(px), jnp.asarray(ids, jnp.int32),
                  jnp.asarray(mask)), _np_state(hf))}
    logits, boxes = ours.apply(tree, jnp.asarray(px),
                               jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
    import torch
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                 input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(np.ones_like(ids)))
    err = np.abs(np.asarray(boxes) - out.pred_boxes.numpy()).max()
    want = out.logits.numpy()[..., :ids.shape[1]]
    return float(max(err, np.abs(np.asarray(logits) - want).max()))


VERIFIERS: dict[str, Callable[[str], float]] = {
    "clip_text": _verify_clip_text,
    "clip_text_sd3": _verify_clip_text,
    "clip_text_g": _verify_clip_text,
    "clip_vision": _verify_clip_vision,
    "t5": _verify_t5,
    "dinov2": _verify_dinov2,
    "sam": _verify_sam,
    "depth": _verify_depth,
    "gdino": _verify_gdino,
}

# atol per family at fp32 (mirrors tests/test_golden_hf.py tolerances,
# widened for real-checkpoint activation scales)
TOLERANCE: dict[str, float] = {
    "sam": 5e-3, "depth": 5e-3, "gdino": 5e-3,
}
DEFAULT_TOL = 1e-3


def verify_conversion(name: str, src: str | Path) -> float:
    """Run the torch source model vs the converted Flax model. Returns the
    max abs deviation; raises if the family is unsupported or parity fails."""
    if name not in VERIFIERS:
        raise ValueError(
            f"--verify is not supported for {name!r} (no torch runtime for "
            f"this family in-environment); supported: {sorted(VERIFIERS)}. "
            "Conversion itself still checks every tensor is consumed with "
            "matching shapes.")
    err = VERIFIERS[name](str(src))
    tol = TOLERANCE.get(name, DEFAULT_TOL)
    if not np.isfinite(err) or err > tol:
        raise AssertionError(
            f"conversion parity FAILED for {name!r}: max abs err {err:.3e} "
            f"> tol {tol:.0e} — refusing to write the msgpack")
    return err
