"""Instruction-generation throughput on the chip (the L2 layer).

Drives `InstructionGenerator` end-to-end — few-shot prompt build → greedy
Llama decode → parse → self-check re-check (reference semantics:
edit_instruction/instruction_gen.py:98-174) — using the batched bucketed
`LlamaBackend` (left-padded ragged batches, one compile per length
bucket) over the real Llama-3-8B decoder shape.

Honesty notes:
  * W8A8 int8 decoder (`LlamaConfig.quant`) — bf16 8B (~16.6 GB with the
    fp32 lm_head) does not fit a 16 GB v5e chip; int8 is also the mode
    the factory would deploy (ops/quant.py).
  * Weights are FABRICATED at the right shapes/dtypes (int8 kernels +
    unit scales) — throughput is weight-independent, and materializing a
    32 GB float init just to quantize it is pointless on this host.
  * Tokenization is byte-fallback (no tokenizer assets ship in this
    offline image), capped at a 1024-token prompt bucket — roughly the
    footprint of the reference's 5-shot prompts under a real BPE. The
    printed ACCEPTANCE RATE is therefore noise (random weights emit
    junk); instructions/hour at the fixed decode budget is the number.

Usage: python tools/bench_instructions.py [n_captions] [--tiny]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from anyedit_tpu.core.cache import enable_persistent_cache
enable_persistent_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MAX_PROMPT = int(os.environ.get("BENCH_INSTR_PROMPT", "1024"))
MAX_NEW = int(os.environ.get("BENCH_INSTR_NEW", "96"))
# batch 16 OOMs a 16 GB v5e at the 8B shape: ~8 GB int8 weights + float
# embed/head + 32-layer KV caches at cache_len 1120 (batch 16 → 4.7 GB)
# leave no headroom for prefill activations. 8 fits.
BATCH = int(os.environ.get("BENCH_INSTR_BATCH", "8"))


def fabricate_params(model, sample_ids):
    """Random params at init's exact shapes/dtypes without materializing
    a float model: int8 kernels ~ U{-127..127}, scales = 1, floats ~ N(0,
    0.02). NaN-free; values irrelevant to throughput."""
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), sample_ids))
    rng = np.random.default_rng(0)

    def leaf(s):
        if s.dtype == jnp.int8:
            return jnp.asarray(rng.integers(-127, 128, s.shape, np.int8))
        if "float" in str(s.dtype) or s.dtype == jnp.bfloat16:
            if s.ndim <= 1:   # scales / norms / biases: keep positive O(1)
                return jnp.ones(s.shape, s.dtype)
            return jnp.asarray(rng.normal(0, 0.02, s.shape).astype(np.float32),
                               dtype=s.dtype)
        return jnp.zeros(s.shape, s.dtype)

    return jax.tree.map(leaf, shapes)


def main():
    from anyedit_tpu.models.llama import Llama, LLAMA3_8B, TINY_LLAMA
    from anyedit_tpu.instructions.generator import (
        InstructionGenerator, LlamaBackend)
    import dataclasses

    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 128
    tiny = "--tiny" in sys.argv
    cfg = TINY_LLAMA if tiny else dataclasses.replace(LLAMA3_8B, quant=True)
    model = Llama(cfg)
    params = fabricate_params(model, jnp.zeros((1, 8), jnp.int32))
    params = jax.device_put(params)

    v = cfg.vocab_size
    tokenize = lambda s: [1 + (b % (v - 2)) for b in s.encode()][-MAX_PROMPT:]
    detok = lambda ids: bytes((max(0, i - 1) % 256) for i in ids).decode(
        "utf-8", "replace")
    backend = LlamaBackend(model, params, tokenize, detok,
                           max_new=MAX_NEW, batch_size=BATCH)
    # --shots N: the few-shot budget lever (generator.py n_shots) — 2
    # shots land in a ~256-token bucket vs 5 shots' ~1024, a 3-4x prefill
    # cut when quality allows
    shots = (int(sys.argv[sys.argv.index("--shots") + 1])
             if "--shots" in sys.argv else 5)
    gen = InstructionGenerator(llm=backend, seed=0, n_shots=shots)

    subjects = ["a dog", "two children", "a red bus", "an old clock",
                "a bowl of fruit", "a cyclist", "a wooden bench",
                "a tall giraffe"]
    scenes = ["on a beach", "in a busy street", "near a lake",
              "inside a kitchen", "at a train station", "under a tree",
              "on a snowy hill", "beside a brick wall"]
    captions = [f"{subjects[i % 8]} {scenes[(i // 8) % 8]}"
                for i in range(n)]

    # At random weights parse_generation rejects the junk completions, so
    # InstructionGenerator skips the self-check LLM pass — price it
    # explicitly so the number reflects the real per-record budget
    # (1 gen call + 1 eval call, instruction_gen.py:98-174).
    from anyedit_tpu.instructions.prompts import eval_prompt
    eval_prompts = [eval_prompt("replace", c, f"replace the x in {c}", c)
                    for c in captions]

    # warm the bucket programs (gen prompts + short eval prompts)
    t_w = time.perf_counter()
    gen.generate("replace", captions[:BATCH], batch_size=BATCH)
    backend(eval_prompts[:BATCH])
    warm = time.perf_counter() - t_w

    t0 = time.perf_counter()
    records = gen.generate("replace", captions, batch_size=BATCH)
    t1 = time.perf_counter()
    answers = backend(eval_prompts)
    t2 = time.perf_counter()
    dt = t2 - t0
    if records and len(records) >= len(captions) // 2:
        # real weights: the generator already ran its own self-check pass;
        # don't double-charge the explicit one
        dt = t1 - t0

    name = "tiny" if tiny else "Llama-8B-shape W8A8"
    line = {
        "metric": "instruction records/hour/chip (%s, "
                  "%d-tok prompt bucket, %d new tokens, batch %d, "
                  "greedy + self-check)" % (name, MAX_PROMPT, MAX_NEW, BATCH),
        "value": round(n / dt * 3600.0, 1),
        "unit": "records/hour/chip",
        "captions": n,
        "shots": shots,
        "wall_s": round(dt, 2),
        "gen_s": round(t1 - t0, 2),
        "selfcheck_s": round(t2 - t1, 2),
        "warmup_s": round(warm, 2),
        "accept_rate_randweights": round(len(records) / n, 3),
        "yes_rate_selfcheck": round(sum(
            a.strip().lower().startswith("yes") for a in answers) / n, 3),
        "note": "acceptance rate is noise at random weights; throughput "
                "prices the full gen+self-check decode budget per caption",
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
