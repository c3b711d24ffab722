"""Vector index facade: VectorIndexer + VectorSearcher.

Parity surface with the reference's crate facade
(nidx_vector/src/lib.rs:65-148 — VectorIndexer::{index_resource, merge,
deletions_for_resource}, VectorSearcher::{open, search}); the compute runs
through the consolidated device index (see device.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

from ...models.internal import ResourceDoc
from ...query_language import (
    BooleanExpression,
    FacetPrefixAtom,
    KeyPrefixAtom,
    LabelAtom,
    evaluate_bitset,
)
from ...types import OpenIndexMetadata, PrefilterResult, SegmentMetadata
from .config import Quantization, Similarity, VectorCardinality, VectorConfig
from .device import DeviceVectorIndex, VectorHit
from .segment import Elem, create_segment, merge_segments

__all__ = [
    "VectorConfig",
    "Similarity",
    "VectorCardinality",
    "Quantization",
    "VectorIndexer",
    "VectorSearcher",
    "VectorSearchRequest",
    "VectorHit",
    "Elem",
]

# resources marked hidden get their segments tagged (parity:
# nidx_vector SEGMENT_TAGS / hidden-resource support, searcher.rs:206-219)
TAG_HIDDEN = "hidden"


class VectorIndexer:
    """Builds vector segments from resources; merges segments."""

    def __init__(self, config: VectorConfig):
        self.config = config

    def resource_elems(self, resource: ResourceDoc, vectorset: str) -> list[Elem]:
        elems: list[Elem] = []
        for field_id, paragraphs in resource.paragraphs.items():
            field_labels = resource.labels + (
                resource.texts[field_id].labels if field_id in resource.texts else []
            )
            for pid, para in paragraphs.items():
                sentences = para.vectorsets_sentences.get(vectorset, {})
                if not sentences:
                    continue
                labels = field_labels + para.labels
                meta = {
                    "field": field_id,
                    "split": para.split,
                    "position": {
                        "start": para.position.start if para.position else para.start,
                        "end": para.position.end if para.position else para.end,
                        "page_number": para.position.page_number if para.position else 0,
                    },
                }
                if self.config.cardinality == VectorCardinality.MULTI:
                    vecs = np.stack(
                        [np.asarray(s.vector, np.float32) for s in sentences.values()]
                    )
                    elems.append(Elem(key=pid, vectors=vecs, labels=labels, metadata=meta))
                else:
                    for vkey, sentence in sentences.items():
                        elems.append(
                            Elem(
                                key=vkey,
                                vectors=np.asarray(sentence.vector, np.float32).reshape(1, -1),
                                labels=labels,
                                metadata=meta,
                            )
                        )
        return elems

    def index_resource(
        self,
        resource: ResourceDoc,
        vectorset: str,
        output_dir: str,
        *,
        hidden: bool = False,
    ) -> Optional[SegmentMetadata]:
        """Build one segment from one resource (None if nothing to index).

        Parity: nidx_vector/src/indexer.rs index_resource.
        """
        elems = self.resource_elems(resource, vectorset)
        if not elems:
            return None
        tags = {TAG_HIDDEN} if hidden else set()
        return create_segment(output_dir, elems, self.config, tags=tags)

    def deletions_for_resource(self, resource: ResourceDoc, vectorset: str) -> list[str]:
        """Key prefixes to delete when this resource (re)arrives.

        Parity: nidx_vector/src/lib.rs:88-94 — resource-wide prefixes plus
        vectorset-scoped prefixes.
        """
        prefixes = list(resource.vectors_to_delete_in_all_vectorsets)
        prefixes += resource.vector_prefixes_to_delete.get(vectorset, [])
        return prefixes

    def merge(self, open_index: OpenIndexMetadata, output_dir: str) -> SegmentMetadata:
        return merge_segments(output_dir, open_index, self.config)


@dataclass
class VectorSearchRequest:
    """One vector query against an index.

    ``vectors`` is [D], [B, D] or [B, M, D] (multivector MaxSim).
    ``filter`` combines label filters; ``field_filter`` is the prefilter's
    FieldId handoff (nidx_vector/src/searcher.rs:300-312).
    """

    vectors: np.ndarray
    top_k: int = 10
    filter: Optional[BooleanExpression] = None
    field_filter: PrefilterResult = field(default_factory=PrefilterResult.all)
    # boundary-aware key-prefix restriction (the /find `fields=` filter)
    key_prefixes: Optional[list[str]] = None
    min_score: Optional[float] = None
    include_hidden: bool = False
    # False (the reference default) drops results whose vector repeats a
    # higher-ranked result's (Fssc dedup, nidx_vector/src/searcher.rs:150-199)
    with_duplicates: bool = False
    # how ``filter`` combines with the ``field_filter`` prefilter: "or"
    # matches EITHER side (the reference's FilterOperator::Or turning the
    # whole formula into Should clauses, nidx_vector/src/searcher.rs:320);
    # only meaningful when both are present
    filter_operator: str = "and"


class VectorSearcher:
    """Open segments of one vector index; answers queries on device."""

    def __init__(
        self,
        config: VectorConfig,
        open_index: OpenIndexMetadata,
        prev: "VectorSearcher | None" = None,
    ):
        from .segment import open_segment

        segments = [(open_segment(m.path), seq) for m, seq in open_index.segments()]
        self.index = DeviceVectorIndex(
            config, segments, open_index.deletions(),
            prev=prev.index if prev is not None else None,
        )
        self.config = config

    def _resolve_atom(self, atom) -> np.ndarray:
        if isinstance(atom, LabelAtom):
            return self.index.label_postings(atom.label)
        if isinstance(atom, FacetPrefixAtom):
            chunks = [
                pids
                for label, pids in self.index.labels.items()
                if label == atom.facet or label.startswith(atom.facet.rstrip("/") + "/")
            ]
            return np.unique(np.concatenate(chunks)) if chunks else np.zeros(0, np.int32)
        if isinstance(atom, KeyPrefixAtom):
            return self.index.key_prefix_postings(atom.prefixes)
        raise TypeError(f"unsupported filter atom for vector index: {atom!r}")

    def _build_mask(self, request: VectorSearchRequest) -> Optional[np.ndarray]:
        idx = self.index
        mask: Optional[np.ndarray] = None
        if request.filter is not None:
            mask = evaluate_bitset(request.filter, idx.n_para, self._resolve_atom)
        if not request.field_filter.is_all:
            if request.field_filter.is_none:
                field_mask = np.zeros(idx.n_para, dtype=bool)
            else:
                prefixes = [f.as_key_prefix() for f in request.field_filter.fields]
                field_mask = np.zeros(idx.n_para, dtype=bool)
                pids = idx.key_prefix_postings(prefixes)
                field_mask[pids] = True
            if mask is not None and request.filter_operator == "or":
                # FilterOperator::Or — a paragraph passes matching EITHER
                # the prefilter's fields or the paragraph filter
                mask = mask | field_mask
            else:
                mask = field_mask if mask is None else (mask & field_mask)
        if request.key_prefixes:
            kp_mask = np.zeros(idx.n_para, dtype=bool)
            kp_mask[idx.key_prefix_postings(list(request.key_prefixes))] = True
            mask = kp_mask if mask is None else (mask & kp_mask)
        if not request.include_hidden and any(
            TAG_HIDDEN in tags for tags in idx.seg_tags
        ):
            allowed = [
                i for i, tags in enumerate(idx.seg_tags) if TAG_HIDDEN not in tags
            ]
            tag_mask = idx.segment_tag_mask(allowed)[: idx.n_para]
            mask = tag_mask if mask is None else (mask & tag_mask)
        return mask

    def search(self, request: VectorSearchRequest) -> list[list[VectorHit]]:
        q = np.asarray(request.vectors, dtype=np.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        if q.shape[-1] != self.config.dimension:
            raise ValueError(
                f"query vector dimension {q.shape[-1]} does not match the "
                f"vectorset dimension {self.config.dimension}"
            )
        if q.ndim == 3 and self.config.cardinality != VectorCardinality.MULTI:
            raise ValueError("multivector query against a single-vector index")
        mask = self._build_mask(request)
        scores, ids = self.index.search(
            q, request.top_k, para_mask=mask, min_score=request.min_score,
            with_duplicates=request.with_duplicates,
        )
        return [self.index.hits(scores[b], ids[b]) for b in range(scores.shape[0])]
