from anyedit_tpu.weights.convert import (
    convert_unet_sd, convert_vae, convert_clip_text, save_params, load_params_file,
)
