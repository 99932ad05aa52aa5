from anyedit_tpu.models.unet_sd import UNetConfig, UNet2DCondition, SD15_UNET, TINY_UNET
from anyedit_tpu.models.vae import VAEConfig, AutoencoderKL, SD_VAE, TINY_VAE
from anyedit_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder, CLIP_L_TEXT, TINY_TEXT
