"""AnyEdit-TPU: a TPU-native instruction-based image-editing data factory.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
DCDmllm/AnyEdit (see SURVEY.md): ~20 per-task editing pipelines built from a
zoo of frozen vision models (grounding, segmentation, diffusion editors,
inpainting, scorers) over instruction-record streams, plus the AnySD
task-routing fine-tune.

Architecture (vs. the reference's one-script-per-GPU design):
  * models are pure-functional Flax modules with explicit param pytrees,
  * every compute stage is jit/pjit-compiled at fixed shape buckets,
  * pipelines are declarative stage DAGs exchanging on-device arrays,
  * parallelism is a `jax.sharding.Mesh` (dp/tp/ep axes), not shell scripts.
"""

__version__ = "0.1.0"
