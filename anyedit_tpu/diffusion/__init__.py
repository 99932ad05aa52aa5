from anyedit_tpu.diffusion.ip2p import ip2p_edit, predict_edit_mask, noise_diff_heatmap
from anyedit_tpu.diffusion.sampling import sample_text2img, sample_inpaint, sample_img2img
