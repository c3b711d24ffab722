"""Relation (graph) index: entity/relation edges with path queries.

Parity surface with the reference's nidx_relation crate
(nidx_relation/src/lib.rs:124-263, schema.rs:65-94, graph_query_parser.rs):
one document per edge — source/target node (value, type, subtype), relation
type + label, metadata, facets, originating resource field — queried with
single-hop graph path patterns (source/relation/target constraints, fuzzy
node matching with distance 1, undirected option), entity-prefix suggest,
and top-unique-N node collection.

Scale note: relation data is metadata-sized (thousands of edges per shard,
not millions of vectors), so this index is host-resident numpy; the semantic
graph search (node/edge *vectors*) runs through the vector index like the
reference's field_node_vectors/field_edge_vectors do.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field as dc_field
from typing import Optional, Sequence

import msgpack
import numpy as np

from ...models.internal import IndexRelation, ResourceDoc
from ...types import OpenIndexMetadata, SegmentMetadata, Seq
from ...utils.keys import key_matches_prefix
from ..text_engine.fuzzy import FuzzyIndex
from ..text_engine.tokenizer import strip_diacritics

FUZZY_DISTANCE = 1  # parity: nidx_relation/src/reader.rs:33


def _edge_dict(rel: IndexRelation, key: str) -> dict:
    return {
        "key": key,
        "source_value": rel.source.value,
        "source_type": rel.source.ntype,
        "source_subtype": rel.source.subtype,
        "target_value": rel.target.value,
        "target_type": rel.target.ntype,
        "target_subtype": rel.target.subtype,
        "relation": rel.relation,
        "label": rel.label,
        "metadata": rel.metadata,
        "facets": rel.facets,
    }


class RelationIndexer:
    def index_resource(
        self, resource: ResourceDoc, output_dir: str
    ) -> Optional[SegmentMetadata]:
        edges: list[dict] = []
        for fid, relations in resource.relations.items():
            key = f"{resource.resource_id}/{fid}"
            for rel in relations:
                edges.append(_edge_dict(rel, key))
        if not edges:
            return None
        edges.sort(key=lambda e: e["key"])
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "edges.msgpack"), "wb") as f:
            f.write(msgpack.packb(edges))
        meta = {"records": len(edges), "kind": "relation"}
        with open(os.path.join(output_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        return SegmentMetadata(path=output_dir, records=len(edges), index_metadata=meta)

    def deletions_for_resource(self, resource: ResourceDoc) -> list[str]:
        if resource.relation_fields_to_delete:
            return [
                f"{resource.resource_id}/{fid}"
                for fid in resource.relation_fields_to_delete
            ]
        return [resource.resource_id + "/"]

    def merge(self, open_index: OpenIndexMetadata, output_dir: str) -> SegmentMetadata:
        deletions = list(open_index.deletions())
        out: list[dict] = []
        for seg_meta, seq in open_index.segments():
            edges = _load_edges(seg_meta.path)
            applicable = [k for k, dseq in deletions if dseq > seq]
            for e in edges:
                if any(key_matches_prefix(e["key"], p) for p in applicable):
                    continue
                out.append(e)
        out.sort(key=lambda e: e["key"])
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "edges.msgpack"), "wb") as f:
            f.write(msgpack.packb(out))
        meta = {"records": len(out), "kind": "relation"}
        with open(os.path.join(output_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        return SegmentMetadata(path=output_dir, records=len(out), index_metadata=meta)


def _load_edges(path: str) -> list[dict]:
    with open(os.path.join(path, "edges.msgpack"), "rb") as f:
        return msgpack.unpackb(f.read())


@dataclass
class NodePattern:
    """Constraint on one end of a path (parity: GraphQuery node)."""

    value: Optional[str] = None
    ntype: Optional[str] = None
    subtype: Optional[str] = None
    fuzzy: bool = False
    prefix: bool = False


@dataclass
class RelationPattern:
    relation: Optional[str] = None  # relation type
    label: Optional[str] = None


@dataclass
class GraphSearchRequest:
    """Single-hop path query (parity: nodereader GraphSearchRequest)."""

    source: NodePattern = dc_field(default_factory=NodePattern)
    relation: RelationPattern = dc_field(default_factory=RelationPattern)
    target: NodePattern = dc_field(default_factory=NodePattern)
    undirected: bool = False
    top_k: int = 50


@dataclass
class GraphNode:
    value: str
    ntype: str
    subtype: str


@dataclass
class GraphPath:
    source: GraphNode
    relation: str
    label: str
    target: GraphNode
    metadata: dict
    resource_field: str


class RelationSearcher:
    def __init__(self, open_index: OpenIndexMetadata):
        deletions = list(open_index.deletions())
        self.edges: list[dict] = []
        for seg_meta, seq in open_index.segments():
            edges = _load_edges(seg_meta.path)
            applicable = [k for k, dseq in deletions if dseq > seq]
            for e in edges:
                if any(key_matches_prefix(e["key"], p) for p in applicable):
                    continue
                self.edges.append(e)
        values = sorted(
            {e["source_value"] for e in self.edges}
            | {e["target_value"] for e in self.edges}
        )
        # sort by NORMALIZED value: prefix suggest bisects _norm_values, so
        # the normalized list must be the sorted one (case-sensitive ordering
        # of the originals is not, e.g. ['Zebra', 'apple'])
        pairs = sorted((strip_diacritics(v.lower()), v) for v in values)
        self.node_values = [v for _, v in pairs]
        self._norm_values = [n for n, _ in pairs]
        self._fuzzy: FuzzyIndex | None = None

    @property
    def fuzzy_index(self) -> FuzzyIndex:
        if self._fuzzy is None:
            self._fuzzy = FuzzyIndex(self._norm_values)
        return self._fuzzy

    def _node_matches(self, pattern: NodePattern, value: str, ntype: str, subtype: str) -> bool:
        if pattern.ntype is not None and ntype != pattern.ntype:
            return False
        if pattern.subtype is not None and subtype != pattern.subtype:
            return False
        if pattern.value is None:
            return True
        norm_q = strip_diacritics(pattern.value.lower())
        norm_v = strip_diacritics(value.lower())
        if pattern.prefix:
            return norm_v.startswith(norm_q)
        if pattern.fuzzy:
            from ..text_engine.fuzzy import levenshtein_leq

            return levenshtein_leq(norm_q, norm_v, FUZZY_DISTANCE)
        return norm_v == norm_q

    def _rel_matches(self, pattern: RelationPattern, edge: dict) -> bool:
        if pattern.relation is not None and edge["relation"] != pattern.relation:
            return False
        if pattern.label is not None and edge["label"] != pattern.label:
            return False
        return True

    def graph_search(self, request: GraphSearchRequest) -> list[GraphPath]:
        """Single-hop path matching (parity: RelationSearcher::graph_search)."""
        out: list[GraphPath] = []
        for e in self.edges:
            if not self._rel_matches(request.relation, e):
                continue
            forward = self._node_matches(
                request.source, e["source_value"], e["source_type"], e["source_subtype"]
            ) and self._node_matches(
                request.target, e["target_value"], e["target_type"], e["target_subtype"]
            )
            backward = request.undirected and (
                self._node_matches(
                    request.source, e["target_value"], e["target_type"], e["target_subtype"]
                )
                and self._node_matches(
                    request.target, e["source_value"], e["source_type"], e["source_subtype"]
                )
            )
            if not (forward or backward):
                continue
            out.append(
                GraphPath(
                    source=GraphNode(e["source_value"], e["source_type"], e["source_subtype"]),
                    relation=e["relation"],
                    label=e["label"],
                    target=GraphNode(e["target_value"], e["target_type"], e["target_subtype"]),
                    metadata=e.get("metadata") or {},
                    resource_field=e["key"],
                )
            )
            if len(out) >= request.top_k:
                break
        return out

    # ---- boolean path-query expressions --------------------------------
    # (parity: nucliadb_models/graph/requests.py GraphPathQuery — and/or/not
    # combinators over path / source_node / destination_node / node /
    # relation leaves, evaluated by nidx_relation's tantivy boolean query,
    # graph_query_parser.rs:153-237; here a compiled per-edge predicate)

    def _leaf_node_pattern(self, d: dict) -> NodePattern:
        match = d.get("match", "exact")
        return NodePattern(
            value=d.get("value"),
            ntype=d.get("type"),
            subtype=d.get("group"),
            fuzzy=match in ("fuzzy", "fuzzy_words"),
            prefix=bool(d.get("prefix", False)),
        )

    def _compile_expr(self, q: dict):
        if not isinstance(q, dict):
            raise ValueError(f"graph query node must be an object, got {q!r}")
        if "and" in q:
            preds = [self._compile_expr(x) for x in q["and"]]
            return lambda e: all(p(e) for p in preds)
        if "or" in q:
            preds = [self._compile_expr(x) for x in q["or"]]
            return lambda e: any(p(e) for p in preds)
        if "not" in q:
            pred = self._compile_expr(q["not"])
            return lambda e: not pred(e)
        prop = q.get("prop")
        if prop == "path":
            src = self._leaf_node_pattern(q.get("source") or {})
            dst = self._leaf_node_pattern(q.get("destination") or {})
            rel = RelationPattern(label=(q.get("relation") or {}).get("label"))
            undirected = bool(q.get("undirected", False))

            def path_pred(e, src=src, dst=dst, rel=rel, undirected=undirected):
                if not self._rel_matches(rel, e):
                    return False
                fwd = self._node_matches(
                    src, e["source_value"], e["source_type"], e["source_subtype"]
                ) and self._node_matches(
                    dst, e["target_value"], e["target_type"], e["target_subtype"]
                )
                bwd = undirected and self._node_matches(
                    src, e["target_value"], e["target_type"], e["target_subtype"]
                ) and self._node_matches(
                    dst, e["source_value"], e["source_type"], e["source_subtype"]
                )
                return fwd or bwd

            return path_pred
        if prop in ("source_node", "destination_node", "node"):
            pat = self._leaf_node_pattern(q)

            def node_pred(e, pat=pat, prop=prop):
                at_source = self._node_matches(
                    pat, e["source_value"], e["source_type"], e["source_subtype"]
                )
                at_target = self._node_matches(
                    pat, e["target_value"], e["target_type"], e["target_subtype"]
                )
                if prop == "source_node":
                    return at_source
                if prop == "destination_node":
                    return at_target
                return at_source or at_target

            return node_pred
        if prop == "relation":
            rel = RelationPattern(label=q.get("label"))
            return lambda e, rel=rel: self._rel_matches(rel, e)
        raise ValueError(f"unsupported graph query node: {q!r}")

    def graph_search_expr(self, query: dict, top_k: int = 50) -> list[GraphPath]:
        """Boolean path-query evaluation over the open edges."""
        pred = self._compile_expr(query)
        out: list[GraphPath] = []
        for e in self.edges:
            if not pred(e):
                continue
            out.append(
                GraphPath(
                    source=GraphNode(e["source_value"], e["source_type"], e["source_subtype"]),
                    relation=e["relation"],
                    label=e["label"],
                    target=GraphNode(e["target_value"], e["target_type"], e["target_subtype"]),
                    metadata=e.get("metadata") or {},
                    resource_field=e["key"],
                )
            )
            if len(out) >= top_k:
                break
        return out

    def neighbours(self, entry_values: Sequence[str], top_k: int = 50) -> list[GraphPath]:
        """All paths touching any entry node (the /find relations feature)."""
        entry = {strip_diacritics(v.lower()) for v in entry_values}
        out = []
        for e in self.edges:
            if (
                strip_diacritics(e["source_value"].lower()) in entry
                or strip_diacritics(e["target_value"].lower()) in entry
            ):
                out.append(
                    GraphPath(
                        source=GraphNode(e["source_value"], e["source_type"], e["source_subtype"]),
                        relation=e["relation"],
                        label=e["label"],
                        target=GraphNode(e["target_value"], e["target_type"], e["target_subtype"]),
                        metadata=e.get("metadata") or {},
                        resource_field=e["key"],
                    )
                )
                if len(out) >= top_k:
                    break
        return out

    def suggest_nodes(self, prefix: str, top_k: int = 10) -> list[GraphNode]:
        """Entity suggest: prefix match (+fuzzy fallback) over node values.

        Parity: nidx_relation suggest (lib.rs:217-262).
        """
        norm = strip_diacritics(prefix.lower())
        seen: dict[str, GraphNode] = {}
        import bisect

        lo = bisect.bisect_left(self._norm_values, norm)
        for i in range(lo, min(lo + top_k * 2, len(self.node_values))):
            if not self._norm_values[i].startswith(norm):
                break
            seen.setdefault(self.node_values[i], self._make_node(self.node_values[i]))
        if len(seen) < top_k and len(norm) > 2:
            for cand in self.fuzzy_index.expand(norm, FUZZY_DISTANCE):
                idx = self._norm_values.index(cand)
                value = self.node_values[idx]
                seen.setdefault(value, self._make_node(value))
        return list(seen.values())[:top_k]

    def _make_node(self, value: str) -> GraphNode:
        for e in self.edges:
            if e["source_value"] == value:
                return GraphNode(value, e["source_type"], e["source_subtype"])
            if e["target_value"] == value:
                return GraphNode(value, e["target_type"], e["target_subtype"])
        return GraphNode(value, "ENTITY", "")
