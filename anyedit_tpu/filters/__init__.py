from anyedit_tpu.filters.scorers import (
    clip_score, directional_clip_score, l1_distance, cosine_similarity,
    AestheticMLP,
)
from anyedit_tpu.filters.post_filter import post_filter_decision, POST_THRESHOLDS
from anyedit_tpu.filters.pre_filter import pre_filter_decision, PRE_THRESHOLDS
