"""`convert --verify` — conversion-time parity against the ACTUAL torch
checkpoint being converted (weights/verify.py). Uses tiny random-init HF
checkpoints saved to disk as stand-ins for the real downloads (which never
ship in this environment); the harness is identical either way:
from_pretrained → config-adaptive Flax build → converter → dual forward.
"""

import numpy as np
import pytest
import torch

from anyedit_tpu.weights.verify import verify_conversion


def _save_tiny_clip_text(tmp_path):
    from transformers import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=128,
                         max_position_embeddings=16, hidden_act="quick_gelu",
                         attention_dropout=0.0, eos_token_id=126,
                         bos_token_id=125)
    torch.manual_seed(0)
    m = CLIPTextModel(cfg).eval()
    d = tmp_path / "clip_text_ckpt"
    m.save_pretrained(d)
    return d


def test_verify_clip_text_parity(tmp_path):
    d = _save_tiny_clip_text(tmp_path)
    err = verify_conversion("clip_text", d)
    assert err < 1e-3


def test_verify_catches_converter_mismap(tmp_path, monkeypatch):
    """A q/k swap in the converter is statistically invisible on random
    init shapes — the torch-vs-flax forward comparison must catch it."""
    from anyedit_tpu.weights import convert as C

    d = _save_tiny_clip_text(tmp_path)
    real = C.convert_clip_text

    def swapped(tree, src):
        src = dict(src)
        for k in list(src):
            if ".self_attn.q_proj." in k:
                k2 = k.replace(".q_proj.", ".k_proj.")
                src[k], src[k2] = src[k2], src[k]
        return real(tree, src)

    monkeypatch.setattr(C, "convert_clip_text", swapped)
    with pytest.raises(AssertionError, match="parity FAILED"):
        verify_conversion("clip_text", d)


def test_verify_depth_anything_via_hf_renamer(tmp_path):
    """Exercises the HF→official renamer + config-adaptive DPT build."""
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation, Dinov2Config)
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
    torch.manual_seed(1)
    m = DepthAnythingForDepthEstimation(cfg).eval()
    d = tmp_path / "depth_ckpt"
    m.save_pretrained(d)
    assert verify_conversion("depth", d) < 5e-3


def test_verify_unsupported_family_refuses(tmp_path):
    with pytest.raises(ValueError, match="not supported"):
        verify_conversion("lama", tmp_path)


def test_verify_requires_hf_dir(tmp_path):
    with pytest.raises(ValueError, match="HF model directory"):
        verify_conversion("clip_text", tmp_path / "nope.pth")
