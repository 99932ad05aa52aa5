"""`python -m anyedit_tpu` — the factory CLI.

One entry point replaces the reference's 20 launch scripts (scripts/*.sh:
`CUDA_VISIBLE_DEVICES=$1 python <task>_tool.py --start-idx --end-idx ...`).

  run       stream records through pre_filter → edit → post_filter
  filter    run only the pre/post filter gates over existing records
  bench     throughput benchmark (same as bench.py)
  export    ledger → reference-format result JSONs
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _add_shard_args(p):
    p.add_argument("--shard-index", type=int, default=0)
    p.add_argument("--shard-count", type=int, default=1)
    p.add_argument("--start-idx", type=int, default=None)
    p.add_argument("--end-idx", type=int, default=None)


def cmd_run(args) -> int:
    from anyedit_tpu.core.ledger import Shard
    from anyedit_tpu.core.schema import read_records
    from anyedit_tpu.runtime.executor import ExecutorConfig, FactoryExecutor
    from anyedit_tpu.runtime.zoo import ModelZoo, ZooConfig

    records = read_records(args.instruction_json)
    if args.edit_type:
        records = [r for r in records if r.edit_type == args.edit_type]
    if not records:
        print("no records to process", file=sys.stderr)
        return 1

    if args.tiny:
        # hermetic smoke configuration: tiny random models, small buckets
        import dataclasses
        import jax.numpy as jnp
        from anyedit_tpu.core.config import CanvasConfig
        from anyedit_tpu.models.gdino import TINY_GDINO
        from anyedit_tpu.models.sam import TINY_SAM
        from anyedit_tpu.models.lama import TINY_LAMA
        from anyedit_tpu.models.unet_sd import TINY_UNET
        from anyedit_tpu.models.vae import TINY_VAE
        from anyedit_tpu.models.clip import TINY_TEXT
        zoo_cfg = ZooConfig(
            canvas=CanvasConfig(edit_size=64, grounding_size=64, sam_size=64,
                                latent_down=2),
            gdino=dataclasses.replace(TINY_GDINO, dtype=jnp.float32),
            sam=dataclasses.replace(TINY_SAM, dtype=jnp.float32),
            lama=TINY_LAMA,
            ip2p_unet=dataclasses.replace(TINY_UNET, in_channels=8,
                                          dtype=jnp.float32),
            vae=dataclasses.replace(TINY_VAE, dtype=jnp.float32),
            text=dataclasses.replace(TINY_TEXT, dtype=jnp.float32,
                                     vocab_size=30522, max_len=77),
            box_threshold=0.0)
    else:
        zoo_cfg = ZooConfig()
    zoo = ModelZoo(zoo_cfg, weights_dir=args.weights, seed=args.seed)
    needs_diffusion = any(r.edit_type not in
                          ("remove", "counting", "add", "movement", "resize",
                           "relation", "outpainting") for r in records)
    tb = zoo.toolbox(with_diffusion=needs_diffusion)
    ex = FactoryExecutor(tb, ExecutorConfig(
        output_root=args.output, seed=args.seed,
        profile_trace_dir=args.profile_trace))

    image_root = Path(args.image_root)

    def load_image(rec):
        from PIL import Image
        return np.asarray(Image.open(image_root / rec.image_file).convert("RGB"))

    shard = Shard(args.shard_index, args.shard_count, args.start_idx, args.end_idx)
    report = ex.run(records, load_image, shard=shard)
    print(json.dumps(report, indent=2))
    return 0


def cmd_export(args) -> int:
    from anyedit_tpu.core.ledger import RunLedger
    led = RunLedger(args.ledger)
    led.export_reference_files(args.output, args.start or 0, args.end)
    led.close()
    print(f"exported to {args.output}")
    return 0


def cmd_bench(args) -> int:
    import bench
    bench.main()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="anyedit_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run editing pipelines over a record stream")
    pr.add_argument("--instruction-json", required=True)
    pr.add_argument("--image-root", required=True)
    pr.add_argument("--edit-type", default=None)
    pr.add_argument("--output", default="out")
    pr.add_argument("--weights", default=None,
                    help="dir of converted .msgpack checkpoints")
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--profile-trace", default=None,
                    help="write a jax.profiler trace here")
    pr.add_argument("--tiny", action="store_true",
                    help="tiny random-weight models (hermetic smoke runs)")
    _add_shard_args(pr)
    pr.set_defaults(fn=cmd_run)

    pe = sub.add_parser("export", help="ledger → reference-format JSONs")
    pe.add_argument("--ledger", required=True)
    pe.add_argument("--output", required=True)
    pe.add_argument("--start", type=int, default=0)
    pe.add_argument("--end", type=int, default=None)
    pe.set_defaults(fn=cmd_export)

    pb = sub.add_parser("bench", help="throughput benchmark")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
