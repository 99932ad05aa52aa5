"""Golden implementation parity vs HuggingFace (random weights, no
downloads): convert an HF model's state dict into our tree and require
numerically matching outputs. This validates converter KEY NAMES, tensor
transforms, and our forward math in one shot — the strongest check
available offline (VERDICT r1 "golden parity" item)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from anyedit_tpu.weights.convert import convert_bert, convert_clip_text


def _np_state(torch_model):
    return {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}


def _decorrelate(torch_model, seed=0):
    """Make every float parameter unique before conversion.

    HF default init zeroes all biases and ones all LayerNorm scales, so a
    converter that cross-wires two of them — or consumes one tensor twice
    and drops another of the same shape — still passes golden parity (the
    'mis-map symmetric under random init' hole weights/verify.py documents
    for real checkpoints). N(0, 0.02) noise on EVERY float parameter
    (buffers untouched: position-id/causal-mask buffers carry semantics)
    breaks the symmetry; both models consume the same perturbed values, so
    parity must still hold."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in torch_model.parameters():
            if p.is_floating_point():
                p.add_(torch.randn(p.shape, generator=g,
                                   dtype=torch.float32).to(p.dtype) * 0.02)
    return torch_model


def _tie_sam_pe(sam_model):
    """HF SamModel holds TWO independently-initialized random-Fourier PE
    buffers (`shared_image_embedding` for the dense image grid and
    `prompt_encoder.shared_embedding` for sparse prompts); the original SAM
    has a single `pe_layer` used for both, so every real checkpoint carries
    them EQUAL. Random-init parity must reproduce the checkpoint invariant
    or the dense-grid PE silently diverges from the prompt PE."""
    with torch.no_grad():
        sam_model.shared_image_embedding.positional_embedding.copy_(
            sam_model.prompt_encoder.shared_embedding.positional_embedding)
    return sam_model


def test_bert_matches_hf():
    from transformers import BertConfig as HFBertConfig, BertModel
    from anyedit_tpu.models.bert import BertConfig, BertEncoder

    hf_cfg = HFBertConfig(vocab_size=128, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          intermediate_size=128, max_position_embeddings=32,
                          type_vocab_size=2, hidden_act="gelu",
                          attention_probs_dropout_prob=0.0,
                          hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = _decorrelate(BertModel(hf_cfg, add_pooling_layer=False).eval())

    ours = BertEncoder(BertConfig(vocab_size=128, hidden=32, layers=2,
                                  heads=2, max_len=32, type_vocab=2,
                                  dtype=jnp.float32))
    ids = np.array([[3, 17, 99, 5, 42, 7]], np.int64)
    tree = ours.init(jax.random.key(0), jnp.asarray(ids, jnp.int32))
    tree = {"params": convert_bert(tree["params"], _np_state(hf))}
    out_ours = np.asarray(ours.apply(tree, jnp.asarray(ids, jnp.int32)))
    with torch.no_grad():
        out_hf = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    # 3e-4: decorrelated LN scales amplify reduction-order ulps slightly
    # (mis-maps show O(1e-1) here)
    np.testing.assert_allclose(out_ours, out_hf, atol=3e-4)


def test_clip_text_matches_hf():
    from transformers import CLIPTextConfig as HFClipCfg, CLIPTextModel
    from anyedit_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder

    hf_cfg = HFClipCfg(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=128,
                       max_position_embeddings=16, hidden_act="quick_gelu",
                       attention_dropout=0.0, eos_token_id=126,
                       bos_token_id=125)
    torch.manual_seed(1)
    hf = _decorrelate(CLIPTextModel(hf_cfg).eval())

    ours = CLIPTextEncoder(CLIPTextConfig(vocab_size=128, hidden=32,
                                          layers=2, heads=2, max_len=16,
                                          dtype=jnp.float32))
    ids = np.array([[125, 9, 33, 77, 126]], np.int64)
    tree = ours.init(jax.random.key(0), jnp.asarray(ids, jnp.int32))
    tree = {"params": convert_clip_text(tree["params"], _np_state(hf))}
    hidden_ours, pooled_ours, penult_ours = ours.apply(
        tree, jnp.asarray(ids, jnp.int32))
    with torch.no_grad():
        out_hf = hf(torch.from_numpy(ids), output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(hidden_ours),
                               out_hf.last_hidden_state.numpy(), atol=1e-4)
    # our pooled = argmax(ids) hidden state; HF pooled uses eos_token_id —
    # identical when EOT is the max id (the real CLIP vocab layout)
    np.testing.assert_allclose(np.asarray(pooled_ours),
                               out_hf.pooler_output.numpy(), atol=1e-4)
    # penult = hidden_states[-2], the clip_skip layer SDXL/SD3 condition on
    # (pre final-LN, diffusers pipeline_stable_diffusion_xl convention)
    np.testing.assert_allclose(np.asarray(penult_ours),
                               out_hf.hidden_states[-2].numpy(), atol=1e-4)


def test_clip_text_with_projection_matches_hf():
    """SDXL text_encoder_2 / SD3 tower checkpoints: projected pooled
    (`text_embeds`) must match HF CLIPTextModelWithProjection."""
    from transformers import CLIPTextConfig as HFClipCfg
    from transformers import CLIPTextModelWithProjection
    from anyedit_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from anyedit_tpu.weights.convert import convert_clip_text

    hf_cfg = HFClipCfg(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=128,
                       max_position_embeddings=16, hidden_act="gelu",
                       attention_dropout=0.0, eos_token_id=126,
                       bos_token_id=125, projection_dim=24)
    torch.manual_seed(3)
    hf = _decorrelate(CLIPTextModelWithProjection(hf_cfg).eval())

    ours = CLIPTextEncoder(CLIPTextConfig(
        vocab_size=128, hidden=32, layers=2, heads=2, max_len=16,
        dtype=jnp.float32, activation="gelu", text_proj=24))
    ids = np.array([[125, 4, 11, 126]], np.int64)
    tree = ours.init(jax.random.key(0), jnp.asarray(ids, jnp.int32))
    tree = {"params": convert_clip_text(tree["params"], _np_state(hf))}
    _, pooled_ours, _ = ours.apply(tree, jnp.asarray(ids, jnp.int32))
    with torch.no_grad():
        out_hf = hf(torch.from_numpy(ids))
    np.testing.assert_allclose(np.asarray(pooled_ours),
                               out_hf.text_embeds.numpy(), atol=1e-4)


def test_clip_vision_matches_hf():
    from transformers import CLIPVisionConfig as HFVisCfg
    from transformers import CLIPVisionModelWithProjection
    from anyedit_tpu.models.clip import CLIPVisionConfig, CLIPVisionEncoder
    from anyedit_tpu.weights.convert import convert_clip_vision

    hf_cfg = HFVisCfg(hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=128,
                      image_size=32, patch_size=8, projection_dim=16,
                      hidden_act="quick_gelu", attention_dropout=0.0)
    torch.manual_seed(2)
    hf = _decorrelate(CLIPVisionModelWithProjection(hf_cfg).eval())

    ours = CLIPVisionEncoder(CLIPVisionConfig(
        image_size=32, patch=8, hidden=32, layers=2, heads=2, proj_dim=16,
        dtype=jnp.float32, activation="quick_gelu"))
    px = np.random.default_rng(3).standard_normal((1, 32, 32, 3)).astype(np.float32)
    tree = ours.init(jax.random.key(0), jnp.asarray(px))
    tree = {"params": convert_clip_vision(tree["params"], _np_state(hf))}
    tokens, z = ours.apply(tree, jnp.asarray(px))
    with torch.no_grad():
        out = hf(torch.from_numpy(px.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(tokens[:, 0]),
                               out.last_hidden_state.numpy()[:, 0], atol=1e-4)
    want = out.image_embeds.numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(z), want, atol=1e-4)


def test_aesthetic_mlp_converter():
    from anyedit_tpu.filters.scorers import AestheticMLP
    from anyedit_tpu.weights.convert import convert_aesthetic

    mlp = torch.nn.Sequential(
        torch.nn.Linear(8, 16), torch.nn.Dropout(0.2),
        torch.nn.Linear(16, 4), torch.nn.Dropout(0.2),
        torch.nn.Linear(4, 4), torch.nn.Dropout(0.1),
        torch.nn.Linear(4, 4), torch.nn.Linear(4, 1)).eval()
    # our tiny-shape instance for the test: override layer dims via init
    import flax.linen as nn

    class TinyAesthetic(nn.Module):
        @nn.compact
        def __call__(self, emb):
            x = emb
            for i, dim in enumerate([16, 4, 4, 4]):
                x = nn.Dense(dim, name=f"fc{i}")(x)
            return nn.Dense(1, name="out")(x)[..., 0]

    ours = TinyAesthetic()
    emb = np.random.default_rng(4).standard_normal((2, 8)).astype(np.float32)
    tree = ours.init(jax.random.key(0), jnp.asarray(emb))
    st = {k: v.detach().numpy() for k, v in mlp.state_dict().items()}
    st = {f"layers.{k}": v for k, v in st.items()}
    tree = {"params": convert_aesthetic(tree["params"], st)}
    got = np.asarray(ours.apply(tree, jnp.asarray(emb)))
    with torch.no_grad():
        want = mlp(torch.from_numpy(emb)).numpy()[..., 0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_t5_encoder_matches_hf():
    """T5 v1.1 gated-gelu encoder (Flux/SD3's text tower): validates the
    relative-position bucketing, RMSNorms, unscaled attention, and the
    converter key map against HF T5EncoderModel."""
    from transformers import T5Config as HFT5Cfg, T5EncoderModel
    from anyedit_tpu.models.t5 import T5Config, T5Encoder
    from anyedit_tpu.weights.convert import convert_t5_encoder

    hf_cfg = HFT5Cfg(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                     num_layers=2, num_heads=4,
                     relative_attention_num_buckets=32,
                     relative_attention_max_distance=128,
                     feed_forward_proj="gated-gelu", dropout_rate=0.0,
                     is_encoder_decoder=False, use_cache=False)
    torch.manual_seed(5)
    hf = _decorrelate(T5EncoderModel(hf_cfg).eval())

    ours = T5Encoder(T5Config(vocab_size=64, dim=32, kv_dim=8, heads=4,
                              ffn_dim=64, enc_layers=2, dec_layers=0,
                              dtype=jnp.float32))
    ids = np.array([[5, 9, 33, 1, 12, 60]], np.int64)
    tree = ours.init(jax.random.key(0), jnp.asarray(ids, jnp.int32))
    tree = {"params": convert_t5_encoder(tree["params"], _np_state(hf))}
    got = np.asarray(ours.apply(tree, jnp.asarray(ids, jnp.int32)))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dinov2_matches_hf():
    """DINOv2 (AnyDoor conditioning / DepthAnything backbone): fused-qkv
    conversion from HF's split q/k/v, layerscale, exact-gelu MLP."""
    from transformers import Dinov2Config as HFDinoCfg, Dinov2Model
    from anyedit_tpu.models.dinov2 import DinoV2, DinoV2Config
    from anyedit_tpu.weights.convert import convert_dinov2

    hf_cfg = HFDinoCfg(hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=128,
                       image_size=28, patch_size=7,
                       layerscale_value=1e-5, hidden_act="gelu",
                       attention_probs_dropout_prob=0.0,
                       hidden_dropout_prob=0.0, drop_path_rate=0.0)
    torch.manual_seed(6)
    hf = _decorrelate(Dinov2Model(hf_cfg).eval())

    ours = DinoV2(DinoV2Config(img_size=28, patch=7, dim=32, depth=2,
                               heads=2, dtype=jnp.float32))
    px = np.random.default_rng(7).standard_normal((1, 28, 28, 3)).astype(np.float32)
    tree = ours.init(jax.random.key(0), jnp.asarray(px))
    tree = {"params": convert_dinov2(tree["params"], _np_state(hf))}
    out = ours.apply(tree, jnp.asarray(px))
    with torch.no_grad():
        want = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(out["cls"]), want[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["patch"]), want[:, 1:], atol=1e-4)


def test_t5_decoder_matches_hf():
    """Full T5 v1.1 enc→dec stack vs HF T5ForConditionalGeneration:
    validates decoder causal relative-position bias, cross-attention,
    untied lm_head (the BLIP-2 flan-T5 answer scorer path)."""
    from transformers import T5Config as HFT5Cfg, T5ForConditionalGeneration
    from anyedit_tpu.models.t5 import T5Config, T5Encoder, T5Decoder
    from anyedit_tpu.weights.convert import convert_t5_encoder, convert_t5_decoder

    hf_cfg = HFT5Cfg(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                     num_layers=2, num_decoder_layers=2, num_heads=4,
                     relative_attention_num_buckets=32,
                     relative_attention_max_distance=128,
                     feed_forward_proj="gated-gelu", dropout_rate=0.0,
                     tie_word_embeddings=False, use_cache=False)
    torch.manual_seed(8)
    hf = _decorrelate(T5ForConditionalGeneration(hf_cfg).eval())

    cfg = T5Config(vocab_size=64, dim=32, kv_dim=8, heads=4, ffn_dim=64,
                   enc_layers=2, dec_layers=2, dtype=jnp.float32)
    enc, dec = T5Encoder(cfg), T5Decoder(cfg)
    enc_ids = np.array([[5, 9, 33, 1]], np.int64)
    dec_ids = np.array([[0, 12, 60]], np.int64)
    st = _np_state(hf)
    enc_tree = enc.init(jax.random.key(0), jnp.asarray(enc_ids, jnp.int32))
    enc_tree = {"params": convert_t5_encoder(enc_tree["params"], st)}
    enc_out = enc.apply(enc_tree, jnp.asarray(enc_ids, jnp.int32))
    dec_tree = dec.init(jax.random.key(1), jnp.asarray(dec_ids, jnp.int32),
                        enc_out)
    dec_tree = {"params": convert_t5_decoder(dec_tree["params"], st)}
    got = np.asarray(dec.apply(dec_tree, jnp.asarray(dec_ids, jnp.int32),
                               enc_out))
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(enc_ids),
                  decoder_input_ids=torch.from_numpy(dec_ids)).logits.numpy()
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_qformer_matches_hf():
    """Post-norm Q-Former vs HF Blip2QFormerModel: query self-attention,
    periodic cross-attention to image tokens, the query-path MLP
    (intermediate_query/output_query), input layernorm, and the
    language_projection head."""
    from transformers import Blip2QFormerConfig, Blip2QFormerModel
    from anyedit_tpu.models.blip2 import QFormer, QFormerConfig
    from anyedit_tpu.models.t5 import T5Config
    from anyedit_tpu.weights.convert import _convert, _qformer_key

    hf_cfg = Blip2QFormerConfig(vocab_size=4, hidden_size=32,
                                num_hidden_layers=2, num_attention_heads=2,
                                intermediate_size=128,
                                cross_attention_frequency=2,
                                encoder_hidden_size=16,
                                attention_probs_dropout_prob=0.0,
                                hidden_dropout_prob=0.0)
    torch.manual_seed(9)
    hf = _decorrelate(Blip2QFormerModel(hf_cfg).eval())

    lm_dim = 24
    cfg = QFormerConfig(num_queries=4, dim=32, layers=2, heads=2,
                        cross_every=2, image_dim=16,
                        lm=T5Config(dim=lm_dim), dtype=jnp.float32)
    ours = QFormer(cfg)
    img = np.random.default_rng(10).standard_normal((1, 5, 16)).astype(np.float32)
    tree = ours.init(jax.random.key(0), jnp.asarray(img))

    qt = torch.randn(1, 4, 32)
    proj = torch.nn.Linear(32, lm_dim)
    st = {f"qformer.{k}": v.detach().numpy()
          for k, v in hf.state_dict().items()}
    st["query_tokens"] = qt.numpy()
    st["language_projection.weight"] = proj.weight.detach().numpy()
    st["language_projection.bias"] = proj.bias.detach().numpy()
    # HF keeps the input layernorm inside Blip2QFormerModel
    tree = {"params": _convert(tree["params"], _qformer_key, st)}
    got = np.asarray(ours.apply(tree, jnp.asarray(img)))
    with torch.no_grad():
        hidden = hf(query_embeds=qt,
                    encoder_hidden_states=torch.from_numpy(img)
                    ).last_hidden_state
        want = proj(hidden).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upernet_swin_matches_hf():
    """UperNet-on-Swin segmenter vs HF UperNetForSemanticSegmentation:
    validates the Swin tower numerics (windowed/shifted attention,
    relative-position bias, patch merging, exact-erf GELU — the same
    module GroundingDINO uses), adaptive-avg-pool PSP, FPN ordering, and
    the BatchNorm folding in the converter."""
    from transformers import (SwinConfig as HFSwinCfg, UperNetConfig,
                              UperNetForSemanticSegmentation)
    from anyedit_tpu.models.segmentation import (SegConfig, UperNetSegmenter)
    from anyedit_tpu.models.swin import SwinConfig
    from anyedit_tpu.weights.convert import convert_upernet_swin

    sw = HFSwinCfg(image_size=64, patch_size=4, embed_dim=16,
                   depths=[2, 2], num_heads=[2, 2], window_size=4,
                   hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                   drop_path_rate=0.0,
                   out_features=["stage1", "stage2"])
    hf_cfg = UperNetConfig(backbone_config=sw, hidden_size=16,
                           pool_scales=(1, 3), num_labels=8,
                           use_auxiliary_head=False)
    torch.manual_seed(11)
    hf = _decorrelate(UperNetForSemanticSegmentation(hf_cfg).eval())

    ours = UperNetSegmenter(SegConfig(
        backbone=SwinConfig(embed_dim=16, depths=(2, 2), heads=(2, 2),
                            window=4, patch=4, out_indices=(0, 1),
                            dtype=jnp.float32),
        num_classes=8, feat_dim=16, pool_scales=(1, 3),
        dtype=jnp.float32))
    px = np.random.default_rng(12).standard_normal((1, 64, 64, 3)).astype(np.float32)
    tree = ours.init(jax.random.key(0), jnp.asarray(px))
    tree = {"params": convert_upernet_swin(tree["params"], _np_state(hf))}
    got = np.asarray(ours.apply(tree, jnp.asarray(px)))
    with torch.no_grad():
        want = hf(torch.from_numpy(px.transpose(0, 3, 1, 2))).logits.numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=1e-3)


def test_got_ocr_matches_hf():
    """Full GOT-OCR2 stack vs HF GotOcr2ForConditionalGeneration: SAM-ViT
    vision tower (windowed + global decomposed-rel-pos attention, neck),
    conv upsampler projector, and the Qwen2 LM (qkv biases, tied lm_head)
    over the [image ⊕ text] sequence."""
    from transformers import GotOcr2ForConditionalGeneration, GotOcr2Config
    from transformers.models.got_ocr2 import GotOcr2VisionConfig
    from transformers import Qwen2Config
    from anyedit_tpu.models.ocr import GotOCR, OCRConfig, TINY_QWEN
    from anyedit_tpu.models.sam import SAMConfig
    from anyedit_tpu.weights.convert import convert_got_ocr

    vc = GotOcr2VisionConfig(hidden_size=16, num_hidden_layers=2,
                             num_attention_heads=2, image_size=64,
                             patch_size=16, window_size=2,
                             global_attn_indexes=[1], mlp_dim=64,
                             output_channels=8)
    tc = Qwen2Config(vocab_size=256, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     intermediate_size=64, rope_theta=10000.0,
                     rms_norm_eps=1e-6, tie_word_embeddings=True,
                     attention_dropout=0.0)
    cfg = GotOcr2Config(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                        image_token_index=255)
    torch.manual_seed(13)
    hf = _decorrelate(GotOcr2ForConditionalGeneration(cfg).eval())

    ours = GotOCR(OCRConfig(
        vision=SAMConfig(img_size=64, patch=16, enc_dim=16, enc_depth=2,
                         enc_heads=2, window=2, global_attn_idx=(1,),
                         out_dim=8, dtype=jnp.float32),
        lm=dataclasses.replace(TINY_QWEN, dtype=jnp.float32),
        dtype=jnp.float32))
    px = np.random.default_rng(14).standard_normal((1, 64, 64, 3)).astype(np.float32)
    # 64px/16 → 4×4 grid → two stride-2 convs → 1×1 → ONE image token
    ids = np.array([[7, 21, 99]], np.int64)
    tree = ours.init(jax.random.key(0), jnp.asarray(px),
                     jnp.asarray(ids, jnp.int32))
    tree = {"params": convert_got_ocr(tree["params"], _np_state(hf))}
    got = np.asarray(ours.apply(tree, jnp.asarray(px),
                                jnp.asarray(ids, jnp.int32)))
    # HF path: image placeholder token first, then the prompt ids
    input_ids = np.concatenate([[[255]], ids], axis=1)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(input_ids),
                  pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                  ).logits.numpy()
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_vila_llava_matches_hf():
    """VILA VQA judge vs HF LlavaForConditionalGeneration: CLIP feature
    layer -2 via a truncated tower, CLS-dropped select, exact-GELU
    projector, Llama decoder over [image ⊕ prompt]."""
    from transformers import (LlavaForConditionalGeneration, LlavaConfig,
                              CLIPVisionConfig as HFVisCfg,
                              LlamaConfig as HFLlamaCfg)
    from anyedit_tpu.models.vila import VilaVQA, VilaConfig
    from anyedit_tpu.models.clip import CLIPVisionConfig
    from anyedit_tpu.models.llama import LlamaConfig
    from anyedit_tpu.weights.convert import convert_vila

    vc = HFVisCfg(hidden_size=16, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=64,
                  image_size=32, patch_size=8, hidden_act="quick_gelu",
                  attention_dropout=0.0)
    tc = HFLlamaCfg(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, num_key_value_heads=2,
                    intermediate_size=64, rope_theta=10000.0,
                    rms_norm_eps=1e-5, attention_dropout=0.0,
                    tie_word_embeddings=False)
    cfg = LlavaConfig(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                      image_token_index=63, vision_feature_layer=-2,
                      vision_feature_select_strategy="default",
                      projector_hidden_act="gelu")
    torch.manual_seed(15)
    hf = _decorrelate(LlavaForConditionalGeneration(cfg).eval())

    ours = VilaVQA(VilaConfig(
        vision=CLIPVisionConfig(image_size=32, patch=8, hidden=16, layers=1,
                                heads=2, use_proj=False, dtype=jnp.float32),
        lm=LlamaConfig(vocab_size=64, dim=32, layers=2, heads=4, kv_heads=2,
                       ffn_dim=64, rope_theta=10000.0, dtype=jnp.float32),
        dtype=jnp.float32))
    px = np.random.default_rng(16).standard_normal((1, 32, 32, 3)).astype(np.float32)
    ids = np.array([[5, 17, 42]], np.int64)
    tree = ours.init(jax.random.key(0), jnp.asarray(px),
                     jnp.asarray(ids, jnp.int32))
    tree = {"params": convert_vila(tree["params"], _np_state(hf))}
    got = np.asarray(ours.apply(tree, jnp.asarray(px),
                                jnp.asarray(ids, jnp.int32)))
    # 16 image patches (CLS dropped) + prompt
    input_ids = np.concatenate([np.full((1, 16), 63), ids], axis=1)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(input_ids),
                  pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                  ).logits.numpy()
    np.testing.assert_allclose(got, want[:, -1], atol=5e-4, rtol=1e-3)


def test_gdino_matches_hf():
    """FULL GroundingDINO vs HF GroundingDinoForObjectDetection: Swin
    backbone, BERT text tower with within-phrase masks + per-segment
    positions, sine pos embeddings (temp 20 vision / 10000 text), fusion,
    deformable attention, language-guided query selection, iterative box
    refinement, unscaled contrastive logits."""
    from transformers import (GroundingDinoConfig,
                              GroundingDinoForObjectDetection,
                              SwinConfig as HFSwinCfg,
                              BertConfig as HFBertCfg)
    from anyedit_tpu.models.gdino import GroundingDINO, GDINOConfig
    from anyedit_tpu.models.swin import SwinConfig
    from anyedit_tpu.models.bert import BertConfig
    from anyedit_tpu.weights.convert import convert_gdino_hf

    sw = HFSwinCfg(image_size=64, patch_size=4, embed_dim=16, depths=[1, 1],
                   num_heads=[2, 2], window_size=4,
                   hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                   drop_path_rate=0.0, out_features=["stage1", "stage2"])
    bt = HFBertCfg(vocab_size=1100, hidden_size=32, num_hidden_layers=1,
                   num_attention_heads=2, intermediate_size=128,
                   max_position_embeddings=32, type_vocab_size=2,
                   hidden_dropout_prob=0.0,
                   attention_probs_dropout_prob=0.0)
    cfg = GroundingDinoConfig(
        backbone_config=sw, text_config=bt, d_model=32,
        encoder_layers=1, decoder_layers=1, num_queries=12,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_feature_levels=2,
        encoder_n_points=2, decoder_n_points=2, max_text_len=16,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        fusion_droppath=0.0, fusion_dropout=0.0, text_enhancer_dropout=0.0)
    torch.manual_seed(17)
    hf = _decorrelate(GroundingDinoForObjectDetection(cfg).eval())

    ours = GroundingDINO(GDINOConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1), heads=(2, 2), window=4,
                        patch=4, out_indices=(0, 1), dtype=jnp.float32),
        bert=BertConfig(vocab_size=1100, hidden=32, layers=1, heads=2,
                        max_len=32, type_vocab=2, dtype=jnp.float32),
        hidden=32, heads=2, enc_layers=1, dec_layers=1, num_queries=12,
        num_levels=2, num_points=2, max_text_len=16, ffn_dim=64,
        dtype=jnp.float32))

    px = np.random.default_rng(18).standard_normal((1, 64, 64, 3)).astype(np.float32)
    ids = np.array([[101, 5, 7, 1012, 9, 11, 1012, 102]], np.int64)
    mask = np.ones_like(ids, bool)
    tree = ours.init(jax.random.key(0), jnp.asarray(px),
                     jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
    tree = {"params": convert_gdino_hf(tree["params"], _np_state(hf))}
    logits, boxes = ours.apply(tree, jnp.asarray(px),
                               jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask))
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                 input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(np.ones_like(ids)))
    np.testing.assert_allclose(np.asarray(boxes), out.pred_boxes.numpy(),
                               atol=1e-4, rtol=1e-3)
    want = out.logits.numpy()[..., :ids.shape[1]]
    np.testing.assert_allclose(np.asarray(logits), want, atol=5e-4, rtol=1e-3)


from anyedit_tpu.weights.convert import (
    hf_sam_to_original as _hf_sam_to_original)


def test_sam_matches_hf():
    """Full SAM (vision encoder + box prompt encoder + two-way mask
    decoder incl. the no-mask dense embedding) vs HF SamModel."""
    import re
    from transformers import SamModel, SamConfig
    from transformers.models.sam.configuration_sam import (
        SamVisionConfig, SamPromptEncoderConfig, SamMaskDecoderConfig)
    from anyedit_tpu.models.sam import SAM, SAMConfig
    from anyedit_tpu.weights.convert import convert_sam

    vc = SamVisionConfig(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, image_size=64, patch_size=8,
                         window_size=4, global_attn_indexes=[1],
                         output_channels=16, mlp_dim=128, num_pos_feats=8)
    pc = SamPromptEncoderConfig(hidden_size=16, image_embedding_size=8,
                                image_size=64, patch_size=8)
    mc = SamMaskDecoderConfig(hidden_size=16, num_hidden_layers=2,
                              num_attention_heads=2, mlp_dim=128,
                              iou_head_depth=3, iou_head_hidden_dim=16)
    cfg = SamConfig(vision_config=vc.to_dict(),
                    prompt_encoder_config=pc.to_dict(),
                    mask_decoder_config=mc.to_dict())
    torch.manual_seed(19)
    hf = _decorrelate(_tie_sam_pe(SamModel(cfg).eval()))

    ours = SAM(SAMConfig(img_size=64, patch=8, enc_dim=32, enc_depth=2,
                         enc_heads=2, window=4, global_attn_idx=(1,),
                         out_dim=16, dec_depth=2, dec_heads=2,
                         dtype=jnp.float32))
    px = np.random.default_rng(20).standard_normal((1, 64, 64, 3)).astype(np.float32)
    boxes = np.array([[[8.0, 12.0, 40.0, 52.0]]], np.float32)   # (1,1,4)
    tree = ours.init(jax.random.key(0), jnp.asarray(px), jnp.asarray(boxes))
    st = _hf_sam_to_original(_np_state(hf))
    st["prompt_encoder.box_corner_embeddings"] = np.stack(
        [st["prompt_encoder.point_embeddings.2.weight"][0],
         st["prompt_encoder.point_embeddings.3.weight"][0]])
    tree = {"params": convert_sam(tree["params"], st)}
    masks, iou = ours.apply(tree, jnp.asarray(px), jnp.asarray(boxes))
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                 input_boxes=torch.from_numpy(boxes.astype(np.float64)))
    want_masks = out.pred_masks.numpy()[0]          # (N, 3, 4h, 4w)
    want_iou = out.iou_scores.numpy()[0]            # (N, 3)
    np.testing.assert_allclose(np.asarray(masks)[:, 1:4], want_masks,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(iou)[:, 1:4], want_iou,
                               atol=5e-4, rtol=1e-3)


def test_depth_anything_matches_hf():
    """DepthAnythingV2 (DINOv2 backbone + DPT neck/fusion head) vs HF
    DepthAnythingForDepthEstimation: validates ln-normed intermediate
    features, reassemble projections/resizes, RefineNet fusion order, and
    the output head."""
    import re
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation, Dinov2Config)
    from anyedit_tpu.models.depth import DepthAnythingV2, DPTConfig
    from anyedit_tpu.models.dinov2 import DinoV2Config
    from anyedit_tpu.weights.convert import convert_depth_anything

    bb = Dinov2Config(hidden_size=32, num_hidden_layers=4,
                      num_attention_heads=2, intermediate_size=128,
                      image_size=56, patch_size=14, layerscale_value=1e-5,
                      hidden_act="gelu", attention_probs_dropout_prob=0.0,
                      hidden_dropout_prob=0.0, drop_path_rate=0.0,
                      out_indices=[1, 2, 3, 4], apply_layernorm=True,
                      reshape_hidden_states=False)
    cfg = DepthAnythingConfig(backbone_config=bb, fusion_hidden_size=16,
                              reassemble_hidden_size=32,
                              neck_hidden_sizes=[8, 8, 16, 16],
                              reassemble_factors=[4, 2, 1, 0.5],
                              patch_size=14, head_hidden_size=32,
                              head_in_index=-1)
    torch.manual_seed(21)
    hf = _decorrelate(DepthAnythingForDepthEstimation(cfg).eval())

    ours = DepthAnythingV2(DPTConfig(
        backbone=DinoV2Config(img_size=56, patch=14, dim=32, depth=4,
                              heads=2, dtype=jnp.float32),
        take_layers=(0, 1, 2, 3), out_channels=(8, 8, 16, 16),
        feat_dim=16, dtype=jnp.float32))

    # HF split q/k/v → official fused-qkv / DA-V2 naming (shared with
    # convert --verify)
    from anyedit_tpu.weights.convert import hf_depth_to_official
    out = hf_depth_to_official(_np_state(hf), 4)

    px = np.random.default_rng(22).standard_normal((1, 56, 56, 3)).astype(np.float32)
    tree = ours.init(jax.random.key(0), jnp.asarray(px))
    tree = {"params": convert_depth_anything(tree["params"], out)}
    got = np.asarray(ours.apply(tree, jnp.asarray(px)))
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))
                  ).predicted_depth.numpy()
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_gdino_sam_bf16_parity_vs_fp32_hf():
    """Mixed-precision case: the production grounding stack runs bf16 on
    TPU (GDINOConfig/SAMConfig default dtype) while HF reference math is
    fp32. Tolerance rationale: bf16 keeps an 8-bit mantissa (~2-3 decimal
    digits); boxes are sigmoid-bounded in [0,1] so absolute error budget is
    ~1e-2 after ~30 matmul depths; SAM iou scores likewise sigmoid-scaled.
    Mask LOGITS and contrastive text logits are unbounded (scale ~10) and
    get a proportionally wider budget. Catches dtype-cast placement bugs
    (e.g. fp32 stats accidentally truncated before a residual join) that
    fp32-only goldens cannot see."""
    from transformers import (GroundingDinoConfig,
                              GroundingDinoForObjectDetection,
                              SwinConfig as HFSwinCfg,
                              BertConfig as HFBertCfg)
    from anyedit_tpu.models.gdino import GroundingDINO, GDINOConfig
    from anyedit_tpu.models.swin import SwinConfig
    from anyedit_tpu.models.bert import BertConfig
    from anyedit_tpu.weights.convert import convert_gdino_hf

    sw = HFSwinCfg(image_size=64, patch_size=4, embed_dim=16, depths=[1, 1],
                   num_heads=[2, 2], window_size=4,
                   hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                   drop_path_rate=0.0, out_features=["stage1", "stage2"])
    bt = HFBertCfg(vocab_size=1100, hidden_size=32, num_hidden_layers=1,
                   num_attention_heads=2, intermediate_size=128,
                   max_position_embeddings=32, type_vocab_size=2,
                   hidden_dropout_prob=0.0,
                   attention_probs_dropout_prob=0.0)
    cfg = GroundingDinoConfig(
        backbone_config=sw, text_config=bt, d_model=32,
        encoder_layers=1, decoder_layers=1, num_queries=12,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_feature_levels=2,
        encoder_n_points=2, decoder_n_points=2, max_text_len=16,
        dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        fusion_droppath=0.0, fusion_dropout=0.0, text_enhancer_dropout=0.0)
    torch.manual_seed(23)
    hf = _decorrelate(GroundingDinoForObjectDetection(cfg).eval())

    ours = GroundingDINO(GDINOConfig(
        swin=SwinConfig(embed_dim=16, depths=(1, 1), heads=(2, 2), window=4,
                        patch=4, out_indices=(0, 1), dtype=jnp.bfloat16),
        bert=BertConfig(vocab_size=1100, hidden=32, layers=1, heads=2,
                        max_len=32, type_vocab=2, dtype=jnp.bfloat16),
        hidden=32, heads=2, enc_layers=1, dec_layers=1, num_queries=12,
        num_levels=2, num_points=2, max_text_len=16, ffn_dim=64,
        dtype=jnp.bfloat16))

    px = np.random.default_rng(24).standard_normal((1, 64, 64, 3)).astype(np.float32)
    ids = np.array([[101, 5, 7, 1012, 9, 11, 1012, 102]], np.int64)
    mask = np.ones_like(ids, bool)
    tree = ours.init(jax.random.key(0), jnp.asarray(px),
                     jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
    tree = {"params": convert_gdino_hf(tree["params"], _np_state(hf))}
    logits, boxes = ours.apply(tree, jnp.asarray(px),
                               jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask))
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                 input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(np.ones_like(ids)))
    # Language-guided query selection is a top-k over near-TIED random-init
    # logits — bf16 rounding legitimately flips the borderline ranks, which
    # swaps whole queries (selection instability, not numerics). Budget: at
    # least 10/12 queries must match within the bf16 tolerance; real
    # checkpoints have well-separated selection logits.
    got_b = np.asarray(boxes, np.float32)
    want_b = out.pred_boxes.numpy()
    got_l = np.asarray(logits, np.float32)
    want_l = out.logits.numpy()[..., :ids.shape[1]]
    per_q_ok = ((np.abs(got_b - want_b).max(-1) < 2e-2)
                & (np.abs(got_l - want_l).max(-1) < 0.15))[0]
    assert per_q_ok.sum() >= 10, (per_q_ok,
                                  np.abs(got_b - want_b).max(-1))

    # SAM bf16 vs fp32 HF (masks sigmoid-thresholded downstream: the
    # decision-relevant quantity is the logit SIGN near 0 — assert logits
    # within an absolute budget scaled to their dynamic range)
    from transformers import SamModel, SamConfig
    from transformers.models.sam.configuration_sam import (
        SamVisionConfig, SamPromptEncoderConfig, SamMaskDecoderConfig)
    from anyedit_tpu.models.sam import SAM, SAMConfig
    from anyedit_tpu.weights.convert import convert_sam

    vc = SamVisionConfig(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, image_size=64, patch_size=8,
                         window_size=4, global_attn_indexes=[1],
                         output_channels=16, mlp_dim=128, num_pos_feats=8)
    pc = SamPromptEncoderConfig(hidden_size=16, image_embedding_size=8,
                                image_size=64, patch_size=8)
    mc = SamMaskDecoderConfig(hidden_size=16, num_hidden_layers=2,
                              num_attention_heads=2, mlp_dim=128,
                              iou_head_depth=3, iou_head_hidden_dim=16)
    scfg = SamConfig(vision_config=vc.to_dict(),
                     prompt_encoder_config=pc.to_dict(),
                     mask_decoder_config=mc.to_dict())
    torch.manual_seed(25)
    hfs = _decorrelate(_tie_sam_pe(SamModel(scfg).eval()))
    ours_s = SAM(SAMConfig(img_size=64, patch=8, enc_dim=32, enc_depth=2,
                           enc_heads=2, window=4, global_attn_idx=(1,),
                           out_dim=16, dec_depth=2, dec_heads=2,
                           dtype=jnp.bfloat16))
    spx = np.random.default_rng(26).standard_normal((1, 64, 64, 3)).astype(np.float32)
    boxes_in = np.array([[[8.0, 12.0, 40.0, 52.0]]], np.float32)
    stree = ours_s.init(jax.random.key(0), jnp.asarray(spx),
                        jnp.asarray(boxes_in))
    st = _hf_sam_to_original(_np_state(hfs))
    st["prompt_encoder.box_corner_embeddings"] = np.stack(
        [st["prompt_encoder.point_embeddings.2.weight"][0],
         st["prompt_encoder.point_embeddings.3.weight"][0]])
    stree = {"params": convert_sam(stree["params"], st)}
    masks, iou = ours_s.apply(stree, jnp.asarray(spx), jnp.asarray(boxes_in))
    with torch.no_grad():
        sout = hfs(pixel_values=torch.from_numpy(spx.transpose(0, 3, 1, 2)),
                   input_boxes=torch.from_numpy(boxes_in.astype(np.float64)))
    want_m = sout.pred_masks.numpy()[0]
    scale = max(1.0, float(np.abs(want_m).max()))
    np.testing.assert_allclose(np.asarray(masks, np.float32)[:, 1:4] / scale,
                               want_m / scale, atol=3e-2)
    np.testing.assert_allclose(np.asarray(iou, np.float32)[:, 1:4],
                               sout.iou_scores.numpy()[0], atol=2e-2)
