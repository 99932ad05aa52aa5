"""Concept-pool curation — the reference's concept pipeline
(diverse_Instruction_generation/concept/: fliter_concept.py CLIP-similarity
dedup, gpt_fliter_concept_pool.py LLM goodness filter,
select_class_name.py head-noun dedup). The web scraper itself is an
offline-excluded data source; everything downstream of a raw concept list
is here.

Stages (compose via `build_concept_pool`):
  1. embedding dedup — CLIP-embed every concept, drop the later member of
     any pair above a cosine threshold (fliter_concept.py stages 1-3),
  2. LLM goodness filter — yes/no judgment that the concept is a common,
     visually depictable, non-proper noun (gpt_fliter_concept_pool.py),
  3. head-noun dedup — drop multi-word concepts whose head (last) word is
     itself in the pool (select_class_name.py).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

LLMFn = Callable[[list[str]], list[str]]

CONCEPT_FILTER_PROMPT = (
    "Decide whether the following concept is a good subject for image "
    "editing data. A good concept is a common noun (not a proper noun, "
    "brand, or species name), has a clear meaning, and names a tangible, "
    "visually depictable object. Answer only yes or no.\n"
    "concept: {concept}\nAnswer yes or no.")


def dedup_by_embedding(concepts: Sequence[str],
                       embed_fn: Callable[[str], np.ndarray],
                       threshold: float = 0.92) -> list[str]:
    """Keep the earlier concept of any pair whose CLIP text embeddings
    exceed `threshold` cosine similarity."""
    if not concepts:
        return []
    embs = np.stack([np.asarray(embed_fn(c)).reshape(-1) for c in concepts])
    embs = embs / np.maximum(np.linalg.norm(embs, axis=-1, keepdims=True),
                             1e-8)
    sim = embs @ embs.T
    keep: list[str] = []
    dropped = np.zeros(len(concepts), bool)
    for i, c in enumerate(concepts):
        if dropped[i]:
            continue
        keep.append(c)
        dropped |= sim[i] > threshold
        dropped[i] = True   # processed
    return keep


def llm_concept_filter(concepts: Sequence[str], llm: LLMFn,
                       batch_size: int = 16) -> list[str]:
    kept: list[str] = []
    for i in range(0, len(concepts), batch_size):
        batch = list(concepts[i:i + batch_size])
        answers = llm([CONCEPT_FILTER_PROMPT.format(concept=c)
                       for c in batch])
        kept.extend(c for c, a in zip(batch, answers)
                    if a.strip().lower().startswith("yes"))
    return kept


def dedup_by_head_noun(concepts: Sequence[str]) -> list[str]:
    """Drop 'winter wren bird' when 'bird' is itself in the pool
    (select_class_name.py semantics)."""
    pool = set(concepts)
    out = []
    for c in concepts:
        words = c.split(" ")
        if len(words) > 1 and words[-1] in pool:
            continue
        out.append(c)
    return out


def build_concept_pool(concepts: Sequence[str],
                       embed_fn: Optional[Callable] = None,
                       llm: Optional[LLMFn] = None,
                       sim_threshold: float = 0.92) -> list[str]:
    pool = list(dict.fromkeys(c.strip() for c in concepts if c.strip()))
    if embed_fn is not None:
        pool = dedup_by_embedding(pool, embed_fn, sim_threshold)
    if llm is not None:
        pool = llm_concept_filter(pool, llm)
    return dedup_by_head_noun(pool)
