"""Training checkpoint/resume via Orbax.

Replaces the reference's HF-Accelerate `save_state` every N steps with
`checkpoints_total_limit` rotation and `--resume_from_checkpoint latest`
directory-scan (train.py:719-745,588-610) with Orbax's async
CheckpointManager: atomic step directories, retention rotation, and
restore-latest — the TPU-native durable-training path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


class TrainCheckpointer:
    def __init__(self, directory: str | Path, keep: int = 3,
                 save_interval_steps: int = 500):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            save_interval_steps=save_interval_steps,
            create=True,
            enable_async_checkpointing=True,
        )
        self.mgr = ocp.CheckpointManager(self.dir, options=options)

    def save(self, step: int, adapter_params: Any, opt_state: Any,
             extra: dict | None = None) -> bool:
        """Returns True if a checkpoint was actually written this step."""
        payload = {"adapter": adapter_params, "opt": opt_state}
        if extra:
            payload["extra"] = extra
        return self.mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore_latest(self, abstract_adapter: Any, abstract_opt: Any
                       ) -> tuple[int | None, Any, Any]:
        """(step, adapter_params, opt_state); (None, None, None) if empty."""
        step = self.mgr.latest_step()
        if step is None:
            return None, None, None
        target = {"adapter": abstract_adapter, "opt": abstract_opt}
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(target))
        return step, restored["adapter"], restored["opt"]

    def wait(self) -> None:
        self.mgr.wait_until_finished()

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
