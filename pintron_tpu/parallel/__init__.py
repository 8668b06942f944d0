"""Multi-chip sharding layer (jax.sharding Mesh + shard_map)."""

from pintron_tpu.parallel.mesh import (alignment_step, make_mesh,
                                       sharded_alignment_step)

__all__ = ["alignment_step", "make_mesh", "sharded_alignment_step"]
