"""`anyedit_tpu train` end-to-end: mixture dataset from a success ledger →
2 tiny training steps → Orbax checkpoint → resume continues from step 2
(the reference's train.py:496-751 loop + --resume_from_checkpoint latest).
"""

import json

import numpy as np
import pytest

from anyedit_tpu.cli import main as cli_main
from anyedit_tpu.train.data import (
    MixtureSampler, examples_from_ledger, TrainExample,
)
from anyedit_tpu.core.schema import InstructionRecord


def _make_ledger(tmp_path, n=6):
    from PIL import Image
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    rows = []
    rng = np.random.default_rng(0)
    types = ["color_alter", "remove", "add"]
    for i in range(n):
        a = img_root / f"in_{i}.png"
        b = img_root / f"ed_{i}.png"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(a)
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(b)
        rec = InstructionRecord(edit=f"edit {i}", input="a", output="b",
                                edit_type=types[i % 3],
                                image_file=str(a)).to_json()
        rows.append({"key": f"k{i}", "status": "success", "record": rec,
                     "payload": {"edited_file": str(b),
                                 "input_file": str(a)}})
    led = tmp_path / "ledger.jsonl"
    led.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return led


def test_examples_and_mixture(tmp_path):
    led = _make_ledger(tmp_path)
    exs = examples_from_ledger(led)
    assert len(exs) == 6
    sampler = MixtureSampler(exs, seed=0)
    assert set(sampler.buckets) == {"color_alter", "remove", "add"}
    # rebalancing: zero weight removes a bucket from the draw
    s2 = MixtureSampler(exs, weights={"remove": 0.0, "add": 0.0,
                                      "color_alter": 1.0}, seed=0)
    for _ in range(8):
        assert s2.sample().record.edit_type == "color_alter"


def test_train_cli_checkpoints_and_resumes(tmp_path, capsys):
    led = _make_ledger(tmp_path)
    ck = tmp_path / "ckpt"
    args = ["train", "--ledger", str(led), "--steps", "2",
            "--batch-size", "2", "--resolution", "32", "--tiny",
            "--checkpoint-dir", str(ck), "--checkpoint-every", "1",
            "--log-every", "1"]
    assert cli_main(args) == 0
    out = capsys.readouterr().out
    final = json.loads(out.strip().splitlines()[-1])
    assert final["final_step"] == 2 and np.isfinite(final["mean_loss"])
    assert any(ck.iterdir()), "no checkpoint written"

    # resume: runs only the remaining steps (2 → 4)
    args2 = [a if a != "2" else "4" for a in args] + ["--resume"]
    # (replace the steps value precisely)
    args2 = ["train", "--ledger", str(led), "--steps", "4",
             "--batch-size", "2", "--resolution", "32", "--tiny",
             "--checkpoint-dir", str(ck), "--checkpoint-every", "1",
             "--log-every", "1", "--resume"]
    assert cli_main(args2) == 0
    out2 = capsys.readouterr().out
    assert "resumed from step 2" in out2
    final2 = json.loads(out2.strip().splitlines()[-1])
    assert final2["final_step"] == 4


def _tiny_train_cfgs():
    """EXACTLY the configs cmd_train builds in --tiny mode."""
    import dataclasses
    import jax.numpy as jnp
    from anyedit_tpu.models.clip import TINY_TEXT, TINY_VISION
    from anyedit_tpu.models.unet_sd import TINY_UNET
    from anyedit_tpu.models.vae import TINY_VAE
    text_cfg = dataclasses.replace(TINY_TEXT, vocab_size=49408,
                                   max_len=16, dtype=jnp.float32)
    vis_cfg = dataclasses.replace(TINY_VISION, dtype=jnp.float32)
    vae_cfg = dataclasses.replace(TINY_VAE, dtype=jnp.float32)
    unet_cfg = dataclasses.replace(TINY_UNET, in_channels=8,
                                   context_dim=text_cfg.hidden,
                                   dtype=jnp.float32)
    return text_cfg, vis_cfg, vae_cfg, unet_cfg


def _write_tiny_weights(wdir, seed=123):
    """Seed-123 'converted checkpoints' for the frozen towers (seed 0 is
    what random init would produce — distinguishable)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.serialization import msgpack_serialize
    from anyedit_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
    from anyedit_tpu.models.unet_sd import UNet2DCondition
    from anyedit_tpu.models.vae import AutoencoderKL

    text_cfg, vis_cfg, vae_cfg, unet_cfg = _tiny_train_cfgs()
    key = jax.random.key(seed)
    wdir.mkdir(parents=True, exist_ok=True)
    specs = {
        "vae": (AutoencoderKL(vae_cfg), (jnp.zeros((1, 32, 32, 3)),)),
        "clip_text": (CLIPTextEncoder(text_cfg),
                      (jnp.zeros((1, text_cfg.max_len), jnp.int32),)),
        "clip_vision": (CLIPVisionEncoder(vis_cfg),
                        (jnp.zeros((1, vis_cfg.image_size,
                                    vis_cfg.image_size, 3)),)),
        "unet_ip2p": (UNet2DCondition(unet_cfg),
                      (jnp.zeros((1, 8, 8, 8)), jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 4, text_cfg.hidden)))),
    }
    params = {}
    for name, (model, ex) in specs.items():
        p = jax.tree.map(np.asarray, model.init(key, *ex))
        (wdir / f"{name}.msgpack").write_bytes(msgpack_serialize(p))
        params[name] = p
    return params


def test_frozen_encoders_load_converted_weights(tmp_path):
    """Converted msgpack params (not random init) must reach the towers."""
    import numpy as np
    from anyedit_tpu.train.frozen import load_frozen_encoders

    wdir = tmp_path / "w"
    saved = _write_tiny_weights(wdir)
    text_cfg, vis_cfg, vae_cfg, _ = _tiny_train_cfgs()
    fz = load_frozen_encoders(vae_cfg, text_cfg, vis_cfg, weights_dir=wdir,
                              require=True, seed=0, resolution=32,
                              allow_fallback_tokenizers=True)
    leaf = lambda t: np.asarray(jax.tree_util.tree_leaves(t)[0])
    import jax
    for got, name in ((fz.vae_params, "vae"), (fz.text_params, "clip_text"),
                      (fz.vision_params, "clip_vision"),
                      (fz.unet_params, "unet_ip2p")):
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(got)[0]),
            np.asarray(jax.tree_util.tree_leaves(saved[name])[0]),
            err_msg=name)

    # require=True + a missing slot must raise, not random-init
    (wdir / "unet_ip2p.msgpack").unlink()
    with pytest.raises(FileNotFoundError, match="unet_ip2p"):
        load_frozen_encoders(vae_cfg, text_cfg, vis_cfg, weights_dir=wdir,
                             require=True, resolution=32,
                             allow_fallback_tokenizers=True)

    # require=True with NO weights_dir must raise, not random-init every
    # tower (the exact silent failure --require-weights exists to prevent)
    with pytest.raises(ValueError, match="weights_dir"):
        load_frozen_encoders(vae_cfg, text_cfg, vis_cfg, weights_dir=None,
                             require=True, resolution=32)


def test_train_cli_weights_dir_and_validation_grid(tmp_path, capsys):
    led = _make_ledger(tmp_path)
    wdir = tmp_path / "w"
    _write_tiny_weights(wdir)
    ck = tmp_path / "ckpt"
    args = ["train", "--ledger", str(led), "--steps", "1",
            "--batch-size", "2", "--resolution", "32", "--tiny",
            "--checkpoint-dir", str(ck), "--checkpoint-every", "1",
            "--log-every", "1", "--weights-dir", str(wdir),
            "--require-weights", "--val-count", "2", "--val-steps", "2"]
    assert cli_main(args) == 0
    out = capsys.readouterr().out
    grids = [json.loads(l)["validation_grid"] for l in out.splitlines()
             if "validation_grid" in l]
    assert grids, out
    from PIL import Image
    g = np.asarray(Image.open(grids[-1]))
    assert g.ndim == 3 and g.shape[0] >= 32 and g.shape[1] >= 64


def test_edit_cli_applies_trained_adapter(tmp_path, capsys):
    """`anyedit_tpu edit`: train 1 tiny step, then edit an image from the
    resulting Orbax checkpoint (the L6 deployment surface)."""
    led = _make_ledger(tmp_path)
    ck = tmp_path / "ckpt"
    args = ["train", "--ledger", str(led), "--steps", "1",
            "--batch-size", "2", "--resolution", "32", "--tiny",
            "--checkpoint-dir", str(ck), "--checkpoint-every", "1",
            "--val-count", "0"]
    assert cli_main(args) == 0
    capsys.readouterr()

    from PIL import Image
    img = tmp_path / "imgs" / "in_0.png"
    out = tmp_path / "out" / "edited.png"
    args2 = ["edit", "--image", str(img), "--instruction", "make it red",
             "--edit-type", "color_alter", "--checkpoint-dir", str(ck),
             "--output", str(out), "--resolution", "32", "--steps", "2",
             "--tiny"]
    assert cli_main(args2) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["output"] == str(out) and meta["edit_type"] == "color_alter"
    arr = np.asarray(Image.open(out))
    assert arr.shape == (32, 32, 3) and arr.dtype == np.uint8


def test_edit_cli_requires_checkpoint(tmp_path):
    from anyedit_tpu.train.inference import AnySDEditor
    from anyedit_tpu.train.anysd import TINY_ANYSD
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError, match="no training checkpoint"):
        AnySDEditor.from_checkpoint(
            TINY_ANYSD, tmp_path / "empty_ck", resolution=32,
            text_cfg=_tiny_train_cfgs()[0], vis_cfg=_tiny_train_cfgs()[1],
            vae_cfg=_tiny_train_cfgs()[2], allow_fallback_tokenizers=True)
