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
    """Constraint on one end of a path (parity: GraphQuery node,
    graph_query_parser.rs Term variants).

    ``match`` selects the value semantics (NodeMatchKindName):
      exact        normalized full-value equality (prefix option)
      fuzzy        OSA distance ≤1 on the normalized full value
                   (tantivy FuzzyTermQuery with transpositions)
      fuzzy_words  every query word fuzzy-matches (d≤1) some word of the
                   node value (Term::FuzzyWord — intersection of per-word
                   fuzzy queries over the tokenized field)
      semantic     value resolved upstream to ``semantic_matches``
                   (Term::FromVectorQuery — const-score union of the
                   vector-nearest node values)
    """

    value: Optional[str] = None
    ntype: Optional[str] = None
    subtype: Optional[str] = None
    fuzzy: bool = False  # legacy flag; same as match="fuzzy"
    prefix: bool = False
    match: str = "exact"
    semantic_matches: Optional[dict[str, float]] = None  # normalized -> score


@dataclass
class RelationPattern:
    relation: Optional[str] = None  # relation type
    label: Optional[str] = None
    match: str = "exact"  # exact | semantic (RelationMatchKindName)
    semantic_matches: Optional[dict[str, float]] = None  # normalized -> score


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
    score: float = 1.0
    facets: list[str] = dc_field(default_factory=list)


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

    def _node_score(
        self, pattern: NodePattern, value: str, ntype: str, subtype: str
    ) -> Optional[float]:
        """Score a node against a pattern; None = no match. Matched clauses
        sum (tantivy's BooleanQuery sums matching Must/Should clause
        scores); semantic matches contribute the vector score
        (ConstScoreQuery, graph_query_parser.rs:497-505)."""
        score = 0.0
        if pattern.ntype is not None:
            if ntype != pattern.ntype:
                return None
            score += 1.0
        if pattern.subtype is not None and pattern.subtype != "":
            if subtype != pattern.subtype:
                return None
            score += 1.0
        if pattern.value is None:
            return score
        norm_v = strip_diacritics(value.lower())
        match = pattern.match
        if pattern.fuzzy and match == "exact":
            match = "fuzzy"
        if match == "semantic":
            sem = pattern.semantic_matches or {}
            s = sem.get(norm_v)
            if s is None:
                return None
            return score + float(s)
        norm_q = strip_diacritics(pattern.value.lower())
        from ..text_engine.fuzzy import osa_leq
        from ..text_engine.tokenizer import tokenize

        if match == "fuzzy_words":
            # Term::FuzzyWord — every query word must fuzzy-match (OSA d≤1,
            # transpositions) some word of the tokenized node value
            node_words = tokenize(norm_v)
            q_words = tokenize(norm_q)
            if not q_words or not node_words:
                return None
            for i, qw in enumerate(q_words):
                last = pattern.prefix and i == len(q_words) - 1
                if not any(
                    self._word_matches(qw, nw, prefix=last) for nw in node_words
                ):
                    return None
            return score + 1.0
        if match == "fuzzy":
            if pattern.prefix:
                # FuzzyTermQuery::new_prefix — the query matches within the
                # value's leading len(q)±d window
                lq = len(norm_q)
                for cut in range(max(lq - FUZZY_DISTANCE, 0), lq + FUZZY_DISTANCE + 1):
                    if osa_leq(norm_q, norm_v[:cut], FUZZY_DISTANCE):
                        return score + 1.0
                return None
            if osa_leq(norm_q, norm_v, FUZZY_DISTANCE):
                return score + 1.0
            return None
        # exact
        if pattern.prefix:
            if norm_v.startswith(norm_q):
                return score + 1.0
            return None
        if norm_v == norm_q:
            return score + 1.0
        return None

    @staticmethod
    def _word_matches(q: str, w: str, *, prefix: bool = False) -> bool:
        from ..text_engine.fuzzy import osa_leq

        if prefix:
            lq = len(q)
            return any(
                osa_leq(q, w[:cut], FUZZY_DISTANCE)
                for cut in range(max(lq - FUZZY_DISTANCE, 0), lq + FUZZY_DISTANCE + 1)
            )
        return osa_leq(q, w, FUZZY_DISTANCE)

    def _node_matches(self, pattern: NodePattern, value: str, ntype: str, subtype: str) -> bool:
        return self._node_score(pattern, value, ntype, subtype) is not None

    def _rel_score(self, pattern: RelationPattern, edge: dict) -> Optional[float]:
        """Score an edge's relation against a pattern; None = no match.
        ``match="semantic"`` resolves the label through the upstream vector
        results (RelationTerm::FromVectorQuery, graph_query_parser.rs)."""
        score = 0.0
        if pattern.relation is not None:
            if edge["relation"] != pattern.relation:
                return None
            score += 1.0
        if pattern.label is not None:
            if pattern.match == "semantic":
                sem = pattern.semantic_matches or {}
                s = sem.get(strip_diacritics(edge["label"].lower()))
                if s is None:
                    return None
                return score + float(s)
            if edge["label"] != pattern.label:
                return None
            score += 1.0
        return score

    def _rel_matches(self, pattern: RelationPattern, edge: dict) -> bool:
        return self._rel_score(pattern, edge) is not None

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
        return NodePattern(
            value=d.get("value"),
            ntype=d.get("type"),
            subtype=d.get("group"),
            match=d.get("match", "exact"),
            prefix=bool(d.get("prefix", False)),
            semantic_matches=d.get("semantic_matches"),
        )

    @staticmethod
    def _generated_score(q: dict, e: dict) -> Optional[float]:
        """``generated`` leaf (requests.py Generated → /g facets,
        query_parser/parsers/graph.py:319-331): user → /g/u facet;
        processor → NOT any /g facet; data-augmentation → /g/da[/task]."""
        facets = e.get("facets") or []
        by = q.get("by")
        if by == "user":
            return 0.0 if "/g/u" in facets else None
        if by == "processor":
            return None if any(f == "/g" or f.startswith("/g/") for f in facets) else 0.0
        if by == "data-augmentation":
            prefix = "/g/da"
            if q.get("da_task"):
                prefix = f"/g/da/{q['da_task']}"
            return 0.0 if any(f.startswith(prefix) for f in facets) else None
        raise ValueError(f"unsupported generated.by: {by!r}")

    def _compile_expr(self, q: dict):
        """Compile a boolean path-query tree into ``edge -> Optional[float]``
        (None = no match; otherwise the summed clause score, the tantivy
        BooleanQuery analogue)."""
        if not isinstance(q, dict):
            raise ValueError(f"graph query node must be an object, got {q!r}")
        if "and" in q:
            preds = [self._compile_expr(x) for x in q["and"]]

            def and_pred(e, preds=preds):
                total = 0.0
                for p in preds:
                    s = p(e)
                    if s is None:
                        return None
                    total += s
                return total

            return and_pred
        if "or" in q:
            preds = [self._compile_expr(x) for x in q["or"]]

            def or_pred(e, preds=preds):
                total = None
                for p in preds:
                    s = p(e)
                    if s is not None:
                        total = (total or 0.0) + s
                return total

            return or_pred
        if "not" in q:
            pred = self._compile_expr(q["not"])
            return lambda e: None if pred(e) is not None else 0.0
        prop = q.get("prop")
        if prop == "path":
            src = self._leaf_node_pattern(q.get("source") or {})
            dst = self._leaf_node_pattern(q.get("destination") or {})
            rel_d = q.get("relation") or {}
            rel = RelationPattern(
                label=rel_d.get("label"),
                relation=rel_d.get("type"),
                match=rel_d.get("match", "exact"),
                semantic_matches=rel_d.get("semantic_matches"),
            )
            undirected = bool(q.get("undirected", False))

            def path_pred(e, src=src, dst=dst, rel=rel, undirected=undirected):
                rel_score = self._rel_score(rel, e)
                if rel_score is None:
                    return None
                s1 = self._node_score(
                    src, e["source_value"], e["source_type"], e["source_subtype"]
                )
                s2 = self._node_score(
                    dst, e["target_value"], e["target_type"], e["target_subtype"]
                )
                fwd = None if s1 is None or s2 is None else s1 + s2 + rel_score
                if not undirected:
                    return fwd
                s3 = self._node_score(
                    src, e["target_value"], e["target_type"], e["target_subtype"]
                )
                s4 = self._node_score(
                    dst, e["source_value"], e["source_type"], e["source_subtype"]
                )
                bwd = None if s3 is None or s4 is None else s3 + s4 + rel_score
                if fwd is None:
                    return bwd
                if bwd is None:
                    return fwd
                return max(fwd, bwd)

            return path_pred
        if prop in ("source_node", "destination_node", "node"):
            pat = self._leaf_node_pattern(q)

            def node_pred(e, pat=pat, prop=prop):
                at_source = self._node_score(
                    pat, e["source_value"], e["source_type"], e["source_subtype"]
                )
                at_target = self._node_score(
                    pat, e["target_value"], e["target_type"], e["target_subtype"]
                )
                if prop == "source_node":
                    return at_source
                if prop == "destination_node":
                    return at_target
                if at_source is None:
                    return at_target
                if at_target is None:
                    return at_source
                return at_source + at_target

            return node_pred
        if prop == "relation":
            rel = RelationPattern(
                label=q.get("label"),
                relation=q.get("type"),
                match=q.get("match", "exact"),
                semantic_matches=q.get("semantic_matches"),
            )
            return lambda e, rel=rel: self._rel_score(rel, e)
        if prop == "generated":
            return lambda e, q=q: self._generated_score(q, e)
        raise ValueError(f"unsupported graph query node: {q!r}")

    def graph_search_expr(self, query: dict, top_k: int = 50) -> list[GraphPath]:
        """Boolean path-query evaluation over the open edges, best-scored
        first (parity: reader.rs paths_graph_search with
        TopDocs::order_by_score)."""
        pred = self._compile_expr(query)
        scored: list[tuple[float, dict]] = []
        for e in self.edges:
            s = pred(e)
            if s is None:
                continue
            scored.append((s, e))
        scored.sort(key=lambda t: (-t[0], t[1]["key"]))
        return [
            GraphPath(
                source=GraphNode(e["source_value"], e["source_type"], e["source_subtype"]),
                relation=e["relation"],
                label=e["label"],
                target=GraphNode(e["target_value"], e["target_type"], e["target_subtype"]),
                metadata=e.get("metadata") or {},
                resource_field=e["key"],
                score=s,
                facets=list(e.get("facets") or []),
            )
            for s, e in scored[:top_k]
        ]

    def nodes_search(
        self, query: dict, top_k: int = 50, *, edge_ok=None
    ) -> list[tuple[GraphNode, float]]:
        """Distinct-node projection (parity: reader.rs nodes_graph_search —
        the node expression is evaluated once with nodes AS SOURCE and once
        AS DESTINATION, unique nodes keep their best score, top-N by score).

        The query tree may contain ``node`` / ``generated`` leaves and
        and/or/not combinators (GraphNodesQuery). ``edge_ok`` optionally
        prefilters edges (resource constraints)."""
        best: dict[tuple[str, str, str], float] = {}
        for position in ("source", "destination"):
            pred = self._compile_node_expr(query, position)
            for e in self.edges:
                if edge_ok is not None and not edge_ok(e):
                    continue
                s = pred(e)
                if s is None:
                    continue
                key = (
                    (e["source_value"], e["source_type"], e["source_subtype"])
                    if position == "source"
                    else (e["target_value"], e["target_type"], e["target_subtype"])
                )
                if s > best.get(key, -1.0):
                    best[key] = s
        ranked = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        return [(GraphNode(*key), score) for key, score in ranked]

    def _compile_node_expr(self, q: dict, position: str):
        """Node-position-scoped compile (parity: BoolNodeQuery evaluated per
        NodePosition, graph_query_parser.rs:194-234)."""
        if not isinstance(q, dict):
            raise ValueError(f"graph query node must be an object, got {q!r}")
        if "and" in q:
            preds = [self._compile_node_expr(x, position) for x in q["and"]]

            def and_pred(e, preds=preds):
                total = 0.0
                for p in preds:
                    s = p(e)
                    if s is None:
                        return None
                    total += s
                return total

            return and_pred
        if "or" in q:
            preds = [self._compile_node_expr(x, position) for x in q["or"]]

            def or_pred(e, preds=preds):
                total = None
                for p in preds:
                    s = p(e)
                    if s is not None:
                        total = (total or 0.0) + s
                return total

            return or_pred
        if "not" in q:
            pred = self._compile_node_expr(q["not"], position)
            return lambda e: None if pred(e) is not None else 0.0
        prop = q.get("prop")
        if prop == "node":
            pat = self._leaf_node_pattern(q)
            if position == "source":
                return lambda e, pat=pat: self._node_score(
                    pat, e["source_value"], e["source_type"], e["source_subtype"]
                )
            return lambda e, pat=pat: self._node_score(
                pat, e["target_value"], e["target_type"], e["target_subtype"]
            )
        if prop == "generated":
            return lambda e, q=q: self._generated_score(q, e)
        raise ValueError(f"unsupported graph nodes query leaf: {q!r}")

    def relations_search(
        self, query: dict, top_k: int = 50, *, edge_ok=None
    ) -> list[tuple[str, str, float]]:
        """Distinct-relation projection (parity: reader.rs
        relations_graph_search + TopUniqueN): unique (type, label) pairs
        from edges matching the path query, best score kept."""
        pred = self._compile_expr(query)
        best: dict[tuple[str, str], float] = {}
        for e in self.edges:
            if edge_ok is not None and not edge_ok(e):
                continue
            s = pred(e)
            if s is None:
                continue
            key = (e["relation"], e["label"])
            if s > best.get(key, -1.0):
                best[key] = s
        ranked = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        return [(rel, label, score) for (rel, label), score in ranked]

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
