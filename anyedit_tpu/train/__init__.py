from anyedit_tpu.train.anysd import (
    AnySDConfig, TaskMoEAdapter, AnySDTrainer, TASK_EMB_BOOKS, EXPERT_NAMES,
)
