"""Index implementations: vector, text, paragraph, relation, json.

Each index follows the reference's crate contract
(nidx/README.md:23-32, dispatch at nidx/src/indexer.rs:380-419):

- ``XIndexer.index_resource(resource, seq, output_dir) -> SegmentMetadata``
- ``XIndexer.deletions_for_resource(resource) -> list[str]`` (key prefixes)
- ``XIndexer.merge(open_index, output_dir) -> SegmentMetadata``
- ``XSearcher.open(open_index)`` / ``.search(request)``

Segments are immutable directories; the service layer owns their lifecycle
(upload/download/commit). The vector index's compute runs on TPU via the
``ops`` kernels; the others build host-side postings that are scored on
device.
"""
