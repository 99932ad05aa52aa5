from anyedit_tpu.train.anysd import (
    AnySDConfig, TaskMoEAdapter, AnySDTrainer, TASK_EMB_BOOKS, EXPERT_NAMES,
)
from anyedit_tpu.train.distill import (
    DistillConfig, LCMDistiller, lcm_edit,
)
