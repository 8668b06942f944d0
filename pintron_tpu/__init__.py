"""pintron-tpu: a TPU-native gene-structure prediction framework.

A from-scratch rebuild of the PIntron spliced-alignment pipeline
(reference: AlgoLab/PIntron) designed TPU-first:

- EST batches are data-parallel across a ``jax.sharding.Mesh`` (the
  reference's per-EST loop, main-est-fact.c:249-291, becomes sharded work).
- The alignment/refinement dynamic programs (refine.c, refine-intron.c,
  compute-alignments.c) run as batched JAX/Pallas kernels over padded
  windows.
- The irregular index walk and combinatorial stages run in a native host
  runtime, with collective merges between stages.

Outputs are required to match the reference pipeline's GTF/JSON exactly on
its regression suite.
"""

__version__ = "0.2.0"

from pintron_tpu.config import Config

__all__ = ["Config", "__version__"]
