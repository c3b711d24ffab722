"""JSON filter index: typed predicates over flattened JSON paths.

Parity surface with the reference's nidx_json crate
(nidx_json/src/lib.rs:14-70, search.rs, schema.rs): each field's JSON value
is flattened into (path, typed value) pairs; queries are boolean trees of
typed predicates (string eq, number eq/range, bool eq, exists) producing a
document set that joins the text prefilter (PrefilterResult intersection at
the query planner, nidx/src/searcher/shard_search.rs:175-208).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field as dc_field
from typing import Any, Optional, Union

import msgpack
import numpy as np

from ...models.internal import ResourceDoc
from ...types import FieldId, OpenIndexMetadata, PrefilterResult, SegmentMetadata, Seq
from ...utils.keys import key_matches_prefix


def flatten_json(value: Any, prefix: str = "") -> list[tuple[str, Any]]:
    out: list[tuple[str, Any]] = []
    if isinstance(value, dict):
        for k, v in value.items():
            out.extend(flatten_json(v, f"{prefix}.{k}" if prefix else str(k)))
    elif isinstance(value, list):
        for v in value:
            out.extend(flatten_json(v, prefix))
    else:
        out.append((prefix, value))
    return out


class JsonIndexer:
    def index_resource(
        self, resource: ResourceDoc, output_dir: str
    ) -> Optional[SegmentMetadata]:
        if resource.skip_json or not resource.json_fields:
            return None
        docs = []
        for fid, raw in sorted(resource.json_fields.items()):
            try:
                value = json.loads(raw)
            except (TypeError, ValueError):
                continue
            docs.append(
                {
                    "key": f"{resource.resource_id}/{fid}",
                    "paths": flatten_json(value),
                }
            )
        if not docs:
            return None
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "docs.msgpack"), "wb") as f:
            f.write(msgpack.packb(docs))
        meta = {"records": len(docs), "kind": "json"}
        with open(os.path.join(output_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        return SegmentMetadata(path=output_dir, records=len(docs), index_metadata=meta)

    def deletions_for_resource(self, resource: ResourceDoc) -> list[str]:
        if resource.json_fields_to_delete:
            return [
                f"{resource.resource_id}/{fid}"
                for fid in resource.json_fields_to_delete
            ]
        return [resource.resource_id + "/"]

    def merge(self, open_index: OpenIndexMetadata, output_dir: str) -> SegmentMetadata:
        deletions = list(open_index.deletions())
        out = []
        for seg_meta, seq in open_index.segments():
            applicable = [k for k, dseq in deletions if dseq > seq]
            for d in _load_docs(seg_meta.path):
                if any(key_matches_prefix(d["key"], p) for p in applicable):
                    continue
                out.append(d)
        out.sort(key=lambda d: d["key"])
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "docs.msgpack"), "wb") as f:
            f.write(msgpack.packb(out))
        meta = {"records": len(out), "kind": "json"}
        with open(os.path.join(output_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        return SegmentMetadata(path=output_dir, records=len(out), index_metadata=meta)


def _load_docs(path: str) -> list[dict]:
    with open(os.path.join(path, "docs.msgpack"), "rb") as f:
        return msgpack.unpackb(f.read())


# --- query model (parity: JsonFilterExpression) ---------------------------


@dataclass
class JsonPredicate:
    path: str
    op: str  # "eq" | "ne" | "gt" | "gte" | "lt" | "lte" | "exists"
    value: Any = None


@dataclass
class JsonAnd:
    operands: list["JsonExpression"]


@dataclass
class JsonOr:
    operands: list["JsonExpression"]


@dataclass
class JsonNot:
    operand: "JsonExpression"


JsonExpression = Union[JsonPredicate, JsonAnd, JsonOr, JsonNot]


def _pred_matches(pred: JsonPredicate, values: list[Any]) -> bool:
    if pred.op == "exists":
        return len(values) > 0
    for v in values:
        if pred.op == "eq" and v == pred.value:
            return True
        if pred.op == "ne" and v != pred.value:
            return True
        if isinstance(v, (int, float)) and isinstance(pred.value, (int, float)):
            if pred.op == "gt" and v > pred.value:
                return True
            if pred.op == "gte" and v >= pred.value:
                return True
            if pred.op == "lt" and v < pred.value:
                return True
            if pred.op == "lte" and v <= pred.value:
                return True
    return False


class JsonSearcher:
    def __init__(self, open_index: OpenIndexMetadata):
        deletions = list(open_index.deletions())
        self.docs: list[dict] = []
        for seg_meta, seq in open_index.segments():
            applicable = [k for k, dseq in deletions if dseq > seq]
            for d in _load_docs(seg_meta.path):
                if any(key_matches_prefix(d["key"], p) for p in applicable):
                    continue
                self.docs.append(d)
        # doc id -> {path -> [values]}
        self.doc_paths: list[dict[str, list[Any]]] = []
        for d in self.docs:
            paths: dict[str, list[Any]] = {}
            for p, v in d["paths"]:
                paths.setdefault(p, []).append(v)
            self.doc_paths.append(paths)

    def _matches(self, expr: JsonExpression, doc_idx: int) -> bool:
        if isinstance(expr, JsonPredicate):
            return _pred_matches(expr, self.doc_paths[doc_idx].get(expr.path, []))
        if isinstance(expr, JsonAnd):
            return all(self._matches(op, doc_idx) for op in expr.operands)
        if isinstance(expr, JsonOr):
            return any(self._matches(op, doc_idx) for op in expr.operands)
        if isinstance(expr, JsonNot):
            return not self._matches(expr.operand, doc_idx)
        raise TypeError(f"bad json expression: {expr!r}")

    def prefilter(self, expr: Optional[JsonExpression]) -> PrefilterResult:
        """Evaluate a JSON filter into a FieldId prefilter
        (combined with the text prefilter by the planner)."""
        if expr is None:
            return PrefilterResult.all()
        fields = []
        for i, d in enumerate(self.docs):
            if self._matches(expr, i):
                rid, fid = d["key"].split("/", 1)
                fields.append(FieldId(resource_id=rid, field_id=fid))
        if not fields:
            return PrefilterResult.none()
        return PrefilterResult.some(fields)
