"""Graph VectorMatch at the node plane: relation node/edge embeddings are
indexed with the relation segment and GraphQuery ``vector`` leaves resolve
against them before evaluation (parity: nidx_vector/src/indexer.rs
index_relation_nodes/edges + nidx/src/searcher/shard_search.rs
run_semantic_graph_queries + query_planner.rs GRAPH_VECTOR_OVERREQUEST)."""

import json
import os

import grpc
import numpy as np
import pytest

from nucliadb_tpu.grpc_plane import NodeGrpcServer
from nucliadb_tpu.grpc_plane import protowire as pw
from nucliadb_tpu.grpc_plane.codec import pack_resource, unpack_resource
from nucliadb_tpu.index.relation import RelationIndexer, RelationSearcher
from nucliadb_tpu.models.internal import (
    IndexRelation,
    RelationNode,
    ResourceDoc,
)
from nucliadb_tpu.services import EmbeddedNode
from nucliadb_tpu.types import SegmentMetadata, SimpleOpenIndex
from tests.protowire_helpers import build_messages, fill

DIM = 8


def vec(*xs):
    v = np.zeros(DIM, np.float32)
    v[: len(xs)] = xs
    return v


def make_doc(rid: str, entities: dict[str, np.ndarray], labels: dict[str, np.ndarray] | None = None):
    """One resource whose field a/metadata mentions every entity, with node
    vectors for each and optional edge-label vectors."""
    doc = ResourceDoc(resource_id=rid)
    rels = []
    for value in entities:
        rels.append(
            IndexRelation(
                source=RelationNode(value=rid, ntype="RESOURCE"),
                target=RelationNode(value=value, ntype="ENTITY", subtype="animal"),
                relation="ENTITY",
                label="mentions",
            )
        )
    doc.relations["a/metadata"] = rels
    doc.field_node_vectors["a/metadata"] = {"gm": dict(entities)}
    if labels:
        doc.field_edge_vectors["a/metadata"] = {"ge": dict(labels)}
    return doc


@pytest.fixture()
def seg_pair(tmp_path):
    idx = RelationIndexer()
    m1 = idx.index_resource(
        make_doc("r1", {"Fox": vec(1, 0), "Bear": vec(0, 1)},
                 labels={"mentions": vec(1, 1)}),
        str(tmp_path / "s1"),
    )
    m2 = idx.index_resource(
        make_doc("r2", {"Órange Fox": vec(0.9, 0.1)},
                 labels={"praises": vec(-1, -1)}),
        str(tmp_path / "s2"),
    )
    return m1, m2


def _searcher(segments, deletions=()):
    return RelationSearcher(
        SimpleOpenIndex(
            segment_list=[(m, i + 1) for i, m in enumerate(segments)],
            deletion_list=list(deletions),
        )
    )


def test_semantic_matches_rank_and_normalize(seg_pair):
    s = _searcher(seg_pair)
    got = s.semantic_node_matches("gm", vec(1, 0), top_n=10)
    # normalized keys, dot-ordered: fox (1.0) > órange fox (0.9) > bear (0.0)
    assert list(got) == ["fox", "orange fox", "bear"]
    assert got["fox"] == pytest.approx(1.0)
    assert got["orange fox"] == pytest.approx(0.9)
    # min_score cuts the tail
    got = s.semantic_node_matches("gm", vec(1, 0), top_n=10, min_score=0.5)
    assert list(got) == ["fox", "orange fox"]
    # unknown vectorset is loud (parity: NidxError::NotFound)
    with pytest.raises(LookupError):
        s.semantic_node_matches("nope", vec(1, 0), top_n=10)
    # edge labels resolve through their own table
    got = s.semantic_edge_matches("ge", vec(1, 1), top_n=10)
    assert list(got) == ["mentions"]


def test_resolve_vector_leaves_and_search(seg_pair):
    s = _searcher(seg_pair)
    query = {
        "prop": "path",
        "source": {},
        "destination": {"type": "ENTITY", "vector": [float(x) for x in vec(0, 1)]},
        "relation": {},
    }
    resolved = s.resolve_vector_leaves(query, top_k=10, node_vectorset="gm")
    dst = resolved["destination"]
    assert dst["match"] == "semantic" and "vector" not in dst
    assert max(dst["semantic_matches"], key=dst["semantic_matches"].get) == "bear"
    paths = s.graph_search_expr(resolved, 10)
    assert paths and paths[0].target.value == "Bear"
    # the original query dict is untouched (resolution copies)
    assert "vector" in query["destination"]

    # a vector leaf with no vectorset given fails loud
    with pytest.raises(LookupError):
        s.resolve_vector_leaves(query, top_k=10)
    # queries without vector leaves pass through unresolved tables entirely
    plain = {"prop": "node", "value": "Fox"}
    assert s.resolve_vector_leaves(plain, top_k=10) == plain


def test_relation_semantic_leaf(seg_pair):
    s = _searcher(seg_pair)
    query = {
        "prop": "relation",
        "vector": [float(x) for x in vec(1, 1)],
    }
    resolved = s.resolve_vector_leaves(query, top_k=5, edge_vectorset="ge")
    # "praises" (dot -2) falls below min_score 0; only "mentions" resolves
    assert resolved["semantic_matches"] == {"mentions": pytest.approx(2.0)}
    rels = s.relations_search(resolved, 5)
    assert [(r, l) for r, l, _ in rels] == [("ENTITY", "mentions")]
    assert rels[0][2] == pytest.approx(2.0)  # the vector score carries


def test_merge_and_deletions_drop_vectors(seg_pair, tmp_path):
    # deleting r1 (seq 3 > both segments) removes its edges AND vectors
    s = _searcher(seg_pair, deletions=[("r1/", 3)])
    got = s.semantic_node_matches("gm", vec(1, 0), top_n=10)
    assert list(got) == ["orange fox"]
    # r1's "mentions" edge vector is gone; r2's "praises" scores below 0
    assert s.semantic_edge_matches("ge", vec(1, 1), top_n=10) == {}

    merged = RelationIndexer().merge(
        SimpleOpenIndex(
            segment_list=[(m, i + 1) for i, m in enumerate(seg_pair)],
            deletion_list=[("r1/", 3)],
        ),
        str(tmp_path / "merged"),
    )
    s2 = _searcher([merged])
    assert list(s2.semantic_node_matches("gm", vec(1, 0), top_n=10)) == ["orange fox"]
    assert merged.records == 3  # r2's edge + node vector + edge vector


def test_codec_roundtrip_preserves_graph_vectors():
    doc = make_doc("r9", {"Fox": vec(1, 0)}, labels={"mentions": vec(1, 1)})
    out = unpack_resource(pack_resource(doc))
    nv = out.field_node_vectors["a/metadata"]["gm"]
    assert set(nv) == {"Fox"} and np.allclose(nv["Fox"], vec(1, 0))
    ev = out.field_edge_vectors["a/metadata"]["ge"]
    assert np.allclose(ev["mentions"], vec(1, 1))


# ---------------------------------------------------------------------------
# proto plane e2e: GraphSearch with VectorMatch
# ---------------------------------------------------------------------------

MSGS = build_messages({
    "NewShardRequest": pw.NEW_SHARD_REQUEST,
    "ShardCreated": pw.SHARD_CREATED,
    "OpStatus": pw.OP_STATUS,
    "GraphSearchRequest": pw.GRAPH_SEARCH_REQUEST,
    "GraphSearchResponse": pw.GRAPH_SEARCH_RESPONSE,
    "IndexMessage": pw.INDEX_MESSAGE,
    "Resource": pw.RESOURCE,
})


@pytest.fixture(scope="module")
def plane(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("graph_vm")
    node = EmbeddedNode(data_dir=str(tmp / "node"))
    server = NodeGrpcServer(node, address="127.0.0.1:0")
    server.start()
    channel = grpc.insecure_channel(f"127.0.0.1:{server.port}")

    def call(service, method, req_msg, resp_name):
        fn = channel.unary_unary(
            f"/nidx.{service}/{method}",
            request_serializer=lambda m: m.SerializeToString(),
            response_deserializer=MSGS[resp_name].FromString,
        )
        return fn(req_msg, timeout=30)

    req = MSGS["NewShardRequest"]()
    fill(req, {"kbid": "kbg", "vectorsets_configs": {}})
    shard_id = call("NidxApi", "NewShard", req, "ShardCreated").id

    payload = {
        "resource": {"uuid": "r1"},
        "metadata": {"created": {"seconds": 1000},
                     "modified": {"seconds": 1000}},
        "texts": {"a/metadata": {"text": "animals"}},
        "status": 0,
        "field_relations": {
            "a/metadata": {
                "relations": [
                    {
                        "relation": {
                            "relation": 2,
                            "source": {"value": "r1", "ntype": 2},
                            "to": {"value": ent, "ntype": 0, "subtype": "animal"},
                            "relation_label": "mentions",
                        },
                    }
                    for ent in ("Fox", "Bear")
                ]
            }
        },
        "field_node_vectors": {
            "a/metadata": {
                "node_vectors": {
                    "gm": {
                        "vectors": [
                            {"node_value": "Fox",
                             "vector": [float(x) for x in vec(1, 0)]},
                            {"node_value": "Bear",
                             "vector": [float(x) for x in vec(0, 1)]},
                        ]
                    }
                }
            }
        },
    }
    key = "idx/r1"
    node.storage.put(key, pw.encode(pw.RESOURCE, payload))
    im = MSGS["IndexMessage"]()
    fill(im, {"shard": shard_id, "resource": "r1", "typemessage": 0,
              "storage_key": key, "kbid": "kbg"})
    status = call("NidxIndexer", "Index", im, "OpStatus")
    assert status.status == 0
    node.wait_for_sync()
    yield {"call": call, "shard": shard_id}
    server.stop(0.5)
    channel.close()


def _graph_request(plane, with_vectorset: bool, min_score: float = 0.0):
    req = MSGS["GraphSearchRequest"]()
    payload = {
        "shard_ids": [plane["shard"]],
        "query": {"path": {"path": {
            "destination": {
                "node_type": 0,
                "vector": {"vector": [float(x) for x in vec(0, 1)]},
            },
        }}},
        "kind": 0,
        "top_k": 10,
        "min_score_node_semantic": min_score,
    }
    if with_vectorset:
        payload["graph_node_vectorset"] = "gm"
    fill(req, payload)
    return req


def test_proto_vector_match_resolves(plane):
    resp = plane["call"](
        "NidxSearcher", "GraphSearch", _graph_request(plane, True),
        "GraphSearchResponse",
    )
    targets = [resp.nodes[p.destination].value for p in resp.graph]
    assert targets[0] == "Bear"  # nearest to (0, 1)
    # min_score excludes the orthogonal Fox leg entirely
    resp = plane["call"](
        "NidxSearcher", "GraphSearch", _graph_request(plane, True, min_score=0.5),
        "GraphSearchResponse",
    )
    targets = {resp.nodes[p.destination].value for p in resp.graph}
    assert targets == {"Bear"}


def test_proto_vector_match_missing_vectorset_is_not_found(plane):
    with pytest.raises(grpc.RpcError) as e:
        plane["call"](
            "NidxSearcher", "GraphSearch", _graph_request(plane, False),
            "GraphSearchResponse",
        )
    assert e.value.code() == grpc.StatusCode.NOT_FOUND
