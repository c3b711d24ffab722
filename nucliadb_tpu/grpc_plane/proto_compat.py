"""Protobuf-wire gRPC services: NidxApi + NidxSearcher for reference clients.

Registers the reference's service/method names (nidx_protos/nidx.proto:8-34)
with real protobuf request/response bytes (hand-rolled wire codec,
protowire.py), translating to the node's native request/response types.
A client generated from the reference's .proto files can therefore create
shards, inspect them, and run Search/Suggest against this node without the
msgpack plane.
"""

from __future__ import annotations

from functools import partial

import grpc
import numpy as np

from ..index.vector.config import Similarity, VectorConfig
from ..shard import ShardSearchRequest
from . import protowire as pw

_SIMILARITY_FROM_ENUM = {0: Similarity.COSINE, 1: Similarity.DOT}


def _merge_top(parts: list[list[dict]], key, k: int) -> list[dict]:
    flat = [item for part in parts for item in part]
    flat.sort(key=key, reverse=True)
    return flat[:k] if k > 0 else flat


class ProtoCompatServices:
    def __init__(self, node):
        self.node = node

    # ---- NidxApi ----------------------------------------------------------

    def new_shard(self, request, context):
        vectorsets = {}
        for name, cfg in (request.get("vectorsets_configs") or {}).items():
            cfg = cfg or {}
            vectorsets[name] = VectorConfig(
                dimension=int(cfg.get("vector_dimension", 0) or 0),
                similarity=_SIMILARITY_FROM_ENUM.get(
                    int(cfg.get("similarity", 0)), Similarity.COSINE
                ),
                normalize_vectors=bool(cfg.get("normalize_vectors", False)),
            )
        shard_id = self.node.create_shard(request.get("kbid", ""), vectorsets)
        return {"id": shard_id}

    def delete_shard(self, request, context):
        self.node.delete_shard(request.get("id", ""))
        return {"id": request.get("id", "")}

    def list_shards(self, request, context):
        return {
            "ids": [{"id": s.id} for s in self.node.metadata.list_shards()]
        }

    def get_shard(self, request, context):
        shard_id = (request.get("shard_id") or {}).get("id", "")
        fields = paragraphs = sentences = size_bytes = 0
        for index in self.node.metadata.get_indexes(shard_id):
            segs = self.node.metadata.ready_segments(index.id)
            records = sum(s.records for s in segs)
            size_bytes += sum(s.size_bytes for s in segs)
            if index.kind == "text":
                fields = records
            elif index.kind == "paragraph":
                paragraphs = records
            elif index.kind == "vector" and not request.get("vectorset"):
                sentences += records
            elif index.kind == "vector" and index.name == request.get("vectorset"):
                sentences = records
        return {
            "shard_id": shard_id,
            "fields": fields,
            "paragraphs": paragraphs,
            "sentences": sentences,
            "size_bytes": size_bytes,
        }

    def configure_shards(self, request, context):
        self.node.configure_shards([
            {
                "shard_id": cfg.get("shard_id", ""),
                "prewarm_enabled": bool(cfg.get("prewarm_enabled", False)),
            }
            for cfg in request.get("configs") or []
        ])
        return {}

    def add_vector_set(self, request, context):
        vsid = request.get("id") or {}
        cfg = request.get("config") or {}
        self.node.add_vectorset(
            (vsid.get("shard") or {}).get("id", ""),
            vsid.get("vectorset", ""),
            VectorConfig(
                dimension=int(cfg.get("vector_dimension", 0) or 0),
                similarity=_SIMILARITY_FROM_ENUM.get(
                    int(cfg.get("similarity", 0)), Similarity.COSINE
                ),
                normalize_vectors=bool(cfg.get("normalize_vectors", False)),
            ),
        )
        return {"status": 0}

    def remove_vector_set(self, request, context):
        self.node.delete_vectorset(
            (request.get("shard") or {}).get("id", ""),
            request.get("vectorset", ""),
        )
        return {"status": 0}

    def list_vector_sets(self, request, context):
        shard_id = request.get("id", "")
        return {
            "shard": {"id": shard_id},
            "vectorsets": self.node.list_vectorsets(shard_id),
        }

    # ---- NidxSearcher -----------------------------------------------------

    def extracted_texts(self, request, context):
        out = self.node.extracted_texts(
            request.get("shard_id", ""),
            request.get("field_ids") or [],
            request.get("paragraph_ids") or [],
        )
        return {
            "fields": out["fields"],
            "splits": out["splits"],
            "paragraphs": out["paragraphs"],
        }

    def search(self, request, context):
        top_k = int(request.get("result_per_page", 20) or 20)
        shard_ids = request.get("shard_ids", [])
        vector = request.get("vector") or None
        sreq_kwargs = dict(
            body=request.get("body", ""),
            top_k=top_k,
            paragraph=bool(request.get("paragraph", False)),
            document=bool(request.get("document", False)),
            vector=np.asarray(vector, np.float32) if vector else None,
            vectorset=request.get("vectorset", ""),
            min_score_semantic=request.get("min_score_semantic") or None,
            min_score_bm25=request.get("min_score_bm25") or None,
            security_groups=(request.get("security") or {}).get("access_groups"),
            faceted=(request.get("faceted") or {}).get("labels", []),
            only_faceted=bool(request.get("only_faceted", False)),
        )

        para_parts, doc_parts, vec_parts = [], [], []
        para_total = doc_total = 0
        ematches: list[str] = []
        doc_facets: dict[str, dict] = {}
        served: list[str] = []
        for shard_id in shard_ids:
            resp = self.node.search(shard_id, ShardSearchRequest(**sreq_kwargs))
            served.append(shard_id)
            if resp.paragraph is not None:
                para_total += resp.paragraph.total
                ematches.extend(resp.paragraph.ematches)
                para_parts.append([
                    {
                        "uuid": h.rid,
                        "field": h.field,
                        "start": h.start,
                        "end": h.end,
                        "paragraph": h.paragraph_id,
                        "split": h.split,
                        "index": h.index,
                        "score": {"bm25": h.score},
                        "labels": h.labels,
                    }
                    for h in resp.paragraph.hits
                ])
            if resp.document is not None:
                doc_total += resp.document.total
                doc_parts.append([
                    {
                        "uuid": h.rid,
                        "field": h.field,
                        "score": {"bm25": h.score},
                    }
                    for h in resp.document.hits
                ])
                for prefix, counts in resp.document.facet_counts.items():
                    agg = doc_facets.setdefault(prefix, {})
                    for tag, c in counts.items():
                        agg[tag] = agg.get(tag, 0) + c
            vec_parts.append([
                {
                    "doc_id": {"id": h.key},
                    "score": h.score,
                    "labels": h.labels,
                }
                for h in resp.vector
            ])

        out: dict = {"shard_ids": served}
        if any(doc_parts) or sreq_kwargs["document"]:
            out["document"] = {
                "total": doc_total,
                "results": _merge_top(
                    doc_parts, lambda r: r["score"]["bm25"], top_k
                ),
                "facets": {
                    p: {"facetresults": [
                        {"tag": t, "total": c} for t, c in sorted(counts.items())
                    ]}
                    for p, counts in doc_facets.items()
                },
                "query": sreq_kwargs["body"],
            }
        if any(para_parts) or sreq_kwargs["paragraph"]:
            out["paragraph"] = {
                "total": para_total,
                "results": _merge_top(
                    para_parts, lambda r: r["score"]["bm25"], top_k
                ),
                "query": sreq_kwargs["body"],
                "ematches": ematches,
            }
        if any(vec_parts):
            out["vector"] = {
                "documents": _merge_top(vec_parts, lambda r: r["score"], top_k)
            }
        return out

    def suggest(self, request, context):
        top_k = int(request.get("top_k", 10) or 10)
        results: list[list[dict]] = []
        served = []
        for shard_id in request.get("shard_ids", []):
            searcher = self.node.searcher.shard(shard_id)
            served.append(shard_id)
            if searcher.paragraph is None:
                continue
            results.append([
                {
                    "uuid": h.rid,
                    "field": h.field,
                    "start": h.start,
                    "end": h.end,
                    "paragraph": h.paragraph_id,
                    "split": h.split,
                    "index": h.index,
                    "score": {"bm25": h.score},
                }
                for h in searcher.paragraph.suggest(request.get("body", ""), top_k)
            ])
        merged = _merge_top(results, lambda r: r["score"]["bm25"], top_k)
        return {
            "total": len(merged),
            "results": merged,
            "query": request.get("body", ""),
            "shard_ids": served,
        }


def register_proto_services(server: grpc.Server, node) -> None:
    """Add the protobuf-wire NidxApi/NidxSearcher services to a server."""
    svc = ProtoCompatServices(node)

    def handler(fn, req_schema, resp_schema):
        return grpc.unary_unary_rpc_method_handler(
            fn,
            request_deserializer=partial(pw.decode, req_schema),
            response_serializer=partial(pw.encode, resp_schema),
        )

    api = {
        "GetShard": handler(svc.get_shard, pw.GET_SHARD_REQUEST, pw.SHARD),
        "NewShard": handler(svc.new_shard, pw.NEW_SHARD_REQUEST, pw.SHARD_CREATED),
        "DeleteShard": handler(svc.delete_shard, pw.SHARD_ID, pw.SHARD_ID),
        "ListShards": handler(svc.list_shards, pw.EMPTY_QUERY, pw.SHARD_IDS),
        "ConfigureShards": handler(svc.configure_shards, pw.SHARDS_CONFIG, pw.EMPTY_QUERY),
        "AddVectorSet": handler(svc.add_vector_set, pw.NEW_VECTOR_SET_REQUEST, pw.OP_STATUS),
        "RemoveVectorSet": handler(svc.remove_vector_set, pw.VECTOR_SET_ID, pw.OP_STATUS),
        "ListVectorSets": handler(svc.list_vector_sets, pw.SHARD_ID, pw.VECTOR_SET_LIST),
    }
    searcher = {
        "Search": handler(svc.search, pw.SEARCH_REQUEST, pw.SEARCH_RESPONSE),
        "Suggest": handler(svc.suggest, pw.SUGGEST_REQUEST, pw.SUGGEST_RESPONSE),
        "ExtractedTexts": handler(
            svc.extracted_texts, pw.EXTRACTED_TEXTS_REQUEST, pw.EXTRACTED_TEXTS_RESPONSE
        ),
    }
    server.add_generic_rpc_handlers((
        grpc.method_handlers_generic_handler("nidx.NidxApi", api),
        grpc.method_handlers_generic_handler("nidx.NidxSearcher", searcher),
    ))
