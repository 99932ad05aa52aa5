"""AnySD training data pipeline — the mixture dataset + collate the
reference imports from the absent `AnySD` package (train.py:25-26
`AnyEditMixtureDatasetStageIIsd15` / `collate_fn_ip2pSD15`, fed by a
DistributedSampler at train.py:496-511).

TPU-first design:
  * records stream from success-ledger JSONL (the factory's own output)
    via the native mmap reader (`native.ShardedJsonlReader`) — no
    torch DataLoader; batches are plain numpy → `jax.device_put`,
  * the per-edit-type MIXTURE is a weighted categorical over type buckets
    (the reference balances its 11 expert domains the same way),
  * text/VAE/vision encoding happens on-device in a jitted `encode_batch`
    step (the reference encodes inside its train loop, train.py:629-648);
    host work stays at JPEG decode + resize.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from anyedit_tpu.core.schema import InstructionRecord
from anyedit_tpu.train.anysd import expert_id


@dataclasses.dataclass
class TrainExample:
    record: InstructionRecord
    input_file: Path          # original image
    edited_file: Path         # edit target


def examples_from_ledger(ledger_path: str | Path,
                         image_root: str | Path | None = None
                         ) -> list[TrainExample]:
    """Collect `success` rows with both image files resolvable."""
    root = Path(image_root) if image_root else None
    out: list[TrainExample] = []
    with open(ledger_path) as f:
        for line in f:
            row = json.loads(line)
            if row.get("status") != "success":
                continue
            payload = row.get("payload") or {}
            rec = InstructionRecord.from_json(row["record"])
            edited = payload.get("edited_file")
            inp = payload.get("input_file") or rec.image_file
            if not edited or not inp:
                continue
            ip = Path(inp) if Path(inp).is_absolute() or root is None \
                else root / inp
            ep = Path(edited)
            if ip.exists() and ep.exists():
                out.append(TrainExample(rec, ip, ep))
    return out


class MixtureSampler:
    """Weighted sampling over per-edit-type buckets (the reference's
    mixture dataset semantics): weight defaults to bucket size (plain
    uniform over records); pass `weights` to rebalance domains."""

    def __init__(self, examples: Sequence[TrainExample],
                 weights: Optional[dict[str, float]] = None, seed: int = 0):
        if not examples:
            raise ValueError("no training examples")
        self.buckets: dict[str, list[TrainExample]] = {}
        for ex in examples:
            self.buckets.setdefault(ex.record.edit_type, []).append(ex)
        self.types = sorted(self.buckets)
        w = np.array([(weights or {}).get(t, float(len(self.buckets[t])))
                      for t in self.types], np.float64)
        self.probs = w / w.sum()
        self.rng = np.random.default_rng(seed)

    def sample(self) -> TrainExample:
        t = self.types[int(self.rng.choice(len(self.types), p=self.probs))]
        bucket = self.buckets[t]
        return bucket[int(self.rng.integers(len(bucket)))]


def _load_resized(path: Path, size: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB").resize((size, size),
                                                 Image.LANCZOS)
    return np.asarray(img, np.float32) / 127.5 - 1.0     # [-1, 1]


def pixel_batches(sampler: MixtureSampler, batch_size: int, resolution: int,
                  steps: int,
                  tokenize: Callable[[str], np.ndarray]) -> Iterator[dict]:
    """Yield host-side pixel batches:
    {edited_px, orig_px (B,S,S,3 in [-1,1]), text_ids (B,L), task_id (B,)}."""
    for _ in range(steps):
        exs = [sampler.sample() for _ in range(batch_size)]
        yield {
            "edited_px": np.stack([_load_resized(e.edited_file, resolution)
                                   for e in exs]),
            "orig_px": np.stack([_load_resized(e.input_file, resolution)
                                 for e in exs]),
            "text_ids": np.concatenate([tokenize(e.record.edit)
                                        for e in exs], axis=0),
            "task_id": np.asarray([expert_id(e.record.edit_type)
                                   for e in exs], np.int32),
        }
