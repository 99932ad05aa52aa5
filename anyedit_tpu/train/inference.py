"""AnySD inference — edit images with a trained task-routed adapter.

Closes the L6 loop: the factory trains the adapter (`cli.py train`,
reference train.py), and this module APPLIES a trained checkpoint to new
images — the deployment surface the reference delegates to its separate
AnySD release (README "AnySD" usage; the editor semantics are the
train-time validation path, train.py:37-76: text context ⊕ task-routed
image tokens through the IP2P 3-way-CFG editor).

One `AnySDEditor` holds the frozen towers + UNet + adapter and jits one
editing program; `cmd_train`'s validation grids and the `edit` CLI both
drive it.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.diffusion import ip2p_edit
from anyedit_tpu.ops.resize import imagenet_normalize, resize_image
from anyedit_tpu.train.anysd import AnySDConfig, AnySDTrainer, expert_id
from anyedit_tpu.train.frozen import FrozenEncoders, load_frozen_encoders


class AnySDEditor:
    """Task-routed instruction editor over a trained AnySD adapter.

    edit(image, instruction, edit_type) → edited uint8 image. The frozen
    towers (VAE / CLIP text / CLIP vision / IP2P UNet) come from converted
    msgpacks when available (same contract as training); the adapter comes
    from an Orbax training checkpoint or is passed per call (live
    validation during training).
    """

    def __init__(self, cfg: AnySDConfig, frozen: FrozenEncoders,
                 unet_params, adapter_params=None, resolution: int = 256):
        self.cfg = cfg
        self.frozen = frozen
        self.trainer = AnySDTrainer(cfg)
        self.unet_params = unet_params
        self.adapter_params = adapter_params
        self.resolution = resolution
        f = frozen
        self._sf = f.vae.cfg.scaling_factor
        text_cfg = f.text.cfg

        def tokenize(s: str) -> np.ndarray:
            ids = f.clip_tokenizer.encode(s)[: text_cfg.max_len]
            arr = np.zeros((1, text_cfg.max_len), np.int32)
            arr[0, : len(ids)] = ids
            return arr

        self._tokenize = tokenize

        @functools.partial(jax.jit, static_argnames=("steps",))
        def _run_jit(text_p, adapter_p, unet_p, lat_in, ids, emb, task, k,
                     steps, s_txt, s_img):
            hidden, _, _ = f.text.apply(text_p, ids)
            tok = self.trainer.adapter.apply(adapter_p, emb, task)
            cond = jnp.concatenate([hidden, tok.astype(hidden.dtype)], 1)
            hid_u, _, _ = f.text.apply(text_p, jnp.zeros_like(ids))
            uncond = jnp.concatenate([hid_u, tok.astype(hidden.dtype)], 1)

            def eps_fn(x, t, c_):
                return self.trainer.unet.apply(unet_p, x, t, c_)

            return ip2p_edit(eps_fn, self.trainer.ns, lat_in, cond, uncond,
                             k, num_steps=steps, guidance_scale=s_txt,
                             image_guidance_scale=s_img)

        def _run(adapter_p, unet_p, *a, **k):
            # text params threaded as a traced jit argument (core/jit.py)
            return _run_jit(f.text_params, adapter_p, unet_p, *a, **k)

        self._run = _run

        # pre/post towers jitted too (params as traced args, core/jit.py):
        # VAE encode + CLIP-vision and VAE decode each compile ONE program
        # instead of dispatching op-by-op per edit / validation image.
        @jax.jit
        def _prep_jit(vae_p, vis_p, px):
            mean, _ = f.vae.apply(vae_p, px, method=type(f.vae).encode)
            vpx = resize_image(px * 0.5 + 0.5, f.vision.cfg.image_size,
                               f.vision.cfg.image_size, "bilinear")
            _, emb = f.vision.apply(vis_p, imagenet_normalize(vpx))
            return mean, emb

        @jax.jit
        def _decode_jit(vae_p, out):
            img = f.vae.apply(vae_p, out / self._sf,
                              method=type(f.vae).decode)[0]
            return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5, 0, 255)

        self._prep = lambda px: _prep_jit(f.vae_params, f.vision_params, px)
        self._decode = lambda out: _decode_jit(f.vae_params, out)

    @classmethod
    def from_checkpoint(cls, cfg: AnySDConfig, checkpoint_dir: str | Path,
                        weights_dir: Optional[str | Path] = None,
                        require_weights: bool = False, seed: int = 0,
                        resolution: int = 256,
                        allow_fallback_tokenizers: bool = False,
                        text_cfg=None, vis_cfg=None, vae_cfg=None
                        ) -> "AnySDEditor":
        """Load frozen towers + the LATEST trained adapter from an Orbax
        training checkpoint dir (the `cli.py train --checkpoint-dir`)."""
        from anyedit_tpu.models.clip import CLIP_L_TEXT, CLIP_L_VISION
        from anyedit_tpu.models.vae import SD_VAE
        from anyedit_tpu.train.checkpoint import TrainCheckpointer

        text_cfg = text_cfg or CLIP_L_TEXT
        vis_cfg = vis_cfg or CLIP_L_VISION
        vae_cfg = vae_cfg or SD_VAE
        frozen = load_frozen_encoders(
            vae_cfg, text_cfg, vis_cfg, weights_dir=weights_dir,
            require=require_weights, seed=seed, resolution=resolution,
            allow_fallback_tokenizers=allow_fallback_tokenizers)
        trainer = AnySDTrainer(cfg)
        latent_hw = resolution // (2 ** (len(vae_cfg.block_channels) - 1))
        unet_p, adapter_abs, opt_abs = jax.eval_shape(
            lambda k: trainer.init(k, latent_hw=latent_hw,
                                   text_len=text_cfg.max_len),
            jax.random.key(seed))
        ckpt = TrainCheckpointer(checkpoint_dir)
        step, adapter_p, _ = ckpt.restore_latest(adapter_abs, opt_abs)
        ckpt.close()
        if step is None:
            raise FileNotFoundError(
                f"no training checkpoint found in {checkpoint_dir}")
        if frozen.unet_params is not None:
            unet_params = frozen.unet_params
        else:
            unet_params, _, _ = trainer.init(
                jax.random.key(seed), latent_hw=latent_hw,
                text_len=text_cfg.max_len)
        return cls(cfg, frozen, unet_params, adapter_p,
                   resolution=resolution)

    def edit(self, image_u8: np.ndarray, instruction: str, edit_type: str,
             adapter_params=None, steps: int = 20, text_scale: float = 7.5,
             image_scale: float = 1.5, seed: int = 0) -> np.ndarray:
        """Edit one HWC uint8 image; returns HWC uint8 at the input size."""
        adapter_p = adapter_params if adapter_params is not None \
            else self.adapter_params
        if adapter_p is None:
            raise ValueError("no adapter params: pass adapter_params or "
                             "build via from_checkpoint()")
        f, res = self.frozen, self.resolution
        h0, w0 = image_u8.shape[:2]
        px = resize_image(jnp.asarray(image_u8, jnp.float32)[None] / 127.5
                          - 1.0, res, res, "bilinear")
        mean, emb = self._prep(px)
        ids = jnp.asarray(self._tokenize(instruction))
        task = jnp.asarray([expert_id(edit_type)], jnp.int32)
        out = self._run(adapter_p, self.unet_params, mean * self._sf, ids,
                        emb, task, jax.random.key(seed), steps,
                        float(text_scale), float(image_scale))
        img = self._decode(out)
        img = resize_image(img[None], h0, w0, "bilinear")[0]
        return np.asarray(img).astype(np.uint8)
