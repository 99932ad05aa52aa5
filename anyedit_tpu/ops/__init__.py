from anyedit_tpu.ops.attention import flash_attention, sdpa_xla, attention
from anyedit_tpu.ops.groupnorm import group_norm, group_norm_silu
from anyedit_tpu.ops.resize import resize_image, resize_to_canvas
from anyedit_tpu.ops.morphology import dilate, erode, gaussian_blur, sobel_magnitude
from anyedit_tpu.ops.nms import nms_fixed
