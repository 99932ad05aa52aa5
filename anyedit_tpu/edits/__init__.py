from anyedit_tpu.edits.types import EditOutcome, Toolbox
from anyedit_tpu.edits.registry import EDIT_PIPELINES, get_pipeline
