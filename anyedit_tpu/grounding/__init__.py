from anyedit_tpu.grounding.maskgen import (
    select_boxes, combine_masks, GroundingResult, union_area_ratio,
)
from anyedit_tpu.grounding.tags import generate_tags
from anyedit_tpu.grounding.text import SimpleVocabTokenizer, phrase_token_spans
