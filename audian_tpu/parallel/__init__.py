"""Multi-chip execution: device meshes, halo-exchange collectives, the
sequence/channel-sharded pipeline, sequence-sharded batch detection,
and file-level batch data parallelism."""

from .mesh import make_mesh, P, NamedSharding, Mesh
from .shard import halo_exchange
from .pipeline import ShardedPipeline
from .detect import sharded_band_env
from .batch import map_files

__all__ = ["make_mesh", "P", "NamedSharding", "Mesh", "halo_exchange",
           "ShardedPipeline", "sharded_band_env", "map_files"]
