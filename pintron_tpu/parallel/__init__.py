"""Multi-chip sharding layer (jax.sharding Mesh + shard_map).

Re-exports resolve lazily: importing this package must not import JAX
(multihost's host-mode workers live here and are deliberately JAX-free;
the ~2 s jax import per process was their dominant boot cost).
"""

__all__ = ["alignment_step", "make_mesh", "sharded_alignment_step"]


def __getattr__(name):
    if name in __all__:
        from pintron_tpu.parallel import mesh
        return getattr(mesh, name)
    raise AttributeError(name)
