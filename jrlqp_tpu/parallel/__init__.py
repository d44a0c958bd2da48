"""Mesh/sharding layer: batched QP solves over device meshes."""
from .mesh import BatchStats, make_mesh, shard_batch, solve_sharded

__all__ = ["BatchStats", "make_mesh", "shard_batch", "solve_sharded"]
