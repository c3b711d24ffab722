"""Indexer service: one index operation -> segments + atomic metadata commit.

Parity: nidx/src/indexer.rs:254-419 — per-index fan-out, segment upload,
single metadata transaction marking segments ready + recording deletions +
bumping updated_at, then ack.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Optional

from ..index.vector.config import VectorConfig
from ..metadata import MetadataStore
from ..models.internal import ResourceDoc
from ..shard import ShardConfig, ShardIndexer
from ..storage import Storage
from ..storage.storage import upload_segment
from ..types import Seq


class IndexerService:
    def __init__(self, metadata: MetadataStore, storage: Storage, work_dir: str | None = None):
        self.metadata = metadata
        self.storage = storage
        self.work_dir = work_dir or tempfile.mkdtemp(prefix="ndbtpu_indexer_")
        from ..telemetry.metrics import UtilizationTracker

        self.utilization = UtilizationTracker("indexer")

    def _shard_config(self, shard_id: str) -> ShardConfig:
        shard = self.metadata.get_shard(shard_id)
        if shard is None:
            raise KeyError(f"unknown shard {shard_id}")
        vectorsets = {}
        for index in self.metadata.get_indexes(shard_id):
            if index.kind == "vector":
                vectorsets[index.name] = VectorConfig.from_dict(index.configuration)
        return ShardConfig(shard_id=shard_id, kbid=shard.kbid, vectorsets=vectorsets)

    def index_resource(
        self,
        shard_id: str,
        resource: ResourceDoc,
        *,
        seq: Optional[Seq] = None,
        hidden: bool = False,
    ) -> Seq:
        """Index one resource into a shard at the given (or next) seq."""
        from ..telemetry.tracing import span

        seq = seq if seq is not None else self.metadata.next_seq()
        self.metadata.record_index_request(seq)
        with self.utilization.work(), span(
            "indexer.index_resource", shard_id=shard_id, seq=int(seq)
        ):
            return self._index_resource(shard_id, resource, seq, hidden)

    def _index_resource(self, shard_id, resource, seq, hidden) -> Seq:
        op_dir = os.path.join(self.work_dir, f"op_{int(seq)}")
        try:
            config = self._shard_config(shard_id)
            indexes = {i.full_name: i for i in self.metadata.get_indexes(shard_id)}
            shard_indexer = ShardIndexer(config)
            ops = shard_indexer.index_resource(resource, op_dir, hidden=hidden)

            ready: list[int] = []
            deletions: list[tuple[int, Seq, list[str]]] = []
            touched: list[int] = []
            for op in ops:
                index = indexes.get(op.index_name)
                if index is None:
                    continue
                touched.append(index.id)
                deletions.append((index.id, seq, op.deletions))
                if op.segment is None:
                    continue
                row = self.metadata.create_segment(
                    index.id,
                    seq,
                    op.segment.records,
                    tags=sorted(op.segment.tags),
                    index_metadata=op.segment.index_metadata,
                )
                size = upload_segment(self.storage, row.storage_key, op.segment.path)
                self.metadata.set_segment_size(row.id, size)
                ready.append(row.id)

            self.metadata.commit_operation(
                ready_segments=ready, deletions=deletions, touched_indexes=touched
            )
        finally:
            # the seq must leave the unacked set even on failure, or the
            # merge ack floor wedges forever (retries arrive under a NEW seq,
            # matching the bus's skip+ack poison semantics; the reference's
            # floor comes from NATS, which advances the same way)
            self.metadata.ack_index_request(seq)
            shutil.rmtree(op_dir, ignore_errors=True)
        return seq

    def delete_resource(self, shard_id: str, resource_id: str) -> Seq:
        """Record deletions for a whole resource across every index
        (parity: indexer.rs Deletion operation path)."""
        seq = self.metadata.next_seq()
        self.metadata.record_index_request(seq)
        try:
            prefix = resource_id + "/"
            deletions = []
            touched = []
            for index in self.metadata.get_indexes(shard_id):
                deletions.append((index.id, seq, [prefix]))
                touched.append(index.id)
            self.metadata.commit_operation(
                ready_segments=[], deletions=deletions, touched_indexes=touched
            )
        finally:
            self.metadata.ack_index_request(seq)
        return seq
