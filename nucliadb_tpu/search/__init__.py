"""Search product layer: /find pipeline, rank fusion, suggest, catalog, ask.

Parity with the reference's search service
(nucliadb/src/nucliadb/search/): query parsing, shard fan-out, rank fusion
(RRF k=60), text hydration and response building (find_merge.py), plus the
auxiliary endpoints. The retrieval itself runs in the index node (device
kernels); this layer orchestrates and shapes responses.
"""

from .find import SearchService

__all__ = ["SearchService"]
