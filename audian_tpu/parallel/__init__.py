"""Multi-chip execution: device meshes, halo-exchange collectives, and the
sequence/channel-sharded pipeline."""

from .mesh import make_mesh, P, NamedSharding, Mesh
from .shard import halo_exchange
from .pipeline import ShardedPipeline

__all__ = ["make_mesh", "P", "NamedSharding", "Mesh", "halo_exchange",
           "ShardedPipeline"]
