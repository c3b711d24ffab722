"""Multi-device (mesh) execution: sharded indexes + collective merges.

The TPU-native replacement for the reference's distributed search plane
(nidx/src/searcher/{shard_selector,shards_query,shard_merge,grpc}.rs):
within a TPU slice, a knowledge box's shards live as mesh partitions of the
same device arenas; a query executes on every shard in parallel under
``shard_map`` and the per-shard top-k cuts merge with an ICI all-gather —
replacing per-shard gRPC fan-out + host-side response merging. Host-level
placement across slices (rendezvous hashing) remains a host concern
(services layer).
"""

from .hybrid_mesh import MeshHybridIndex
from .mesh import MeshShardedVectorIndex, make_mesh
from .text_mesh import MeshShardedTextEngine

__all__ = [
    "MeshShardedVectorIndex", "MeshShardedTextEngine", "MeshHybridIndex",
    "make_mesh",
]
