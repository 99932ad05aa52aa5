from anyedit_tpu.runtime.executor import FactoryExecutor, StageTimer
