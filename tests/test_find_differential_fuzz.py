"""Randomized differential test: the product /find pipeline vs a plain
Python oracle over the same evolving corpus.

A random op sequence (create / update / delete, with labels, security
groups and hidden flags) runs through the real Processor -> indexer ->
searcher stack; after every few ops a random keyword query with random
filter / security / show_hidden settings is answered both by
SearchService.find and by a dict-based oracle, and the RESULT SETS must
match exactly. This is the product-level analogue of the engine-level
equivalence fuzzes (test_query_language_fuzz, test_lifecycle_fuzz) — it
exercises brain building, label flow, deletions-by-seq, prefilters,
hidden-resource filtering and security prefilters end to end."""

import numpy as np
import pytest

from nucliadb_tpu.common.kb import KnowledgeBoxManager
from nucliadb_tpu.ingest.processor import Processor
from nucliadb_tpu.maindb import Driver
from nucliadb_tpu.models.api import (
    Classification,
    CreateResourcePayload,
    FilterExpression,
    FindRequest,
    KnowledgeBoxConfig,
    ResourceSecurity,
    SearchFeature,
    SentenceEmbedding,
    TextFieldPayload,
    UpdateResourcePayload,
    UserMetadata,
    VectorSetSpec,
)
from nucliadb_tpu.search import SearchService
from nucliadb_tpu.services import EmbeddedNode
from nucliadb_tpu.index.text_engine.tokenizer import tokenize

VOCAB = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]
LABELSETS = [("topic", "sports"), ("topic", "news"), ("lang", "en")]
GROUPS = ["g1", "g2"]


class Oracle:
    def __init__(self):
        self.docs = {}  # rid -> dict(tokens, labels, groups, hidden)

    def put(self, rid, body, labels, groups, hidden, created):
        self.docs[rid] = {
            "tokens": set(tokenize(body)),
            "labels": set(labels),
            "groups": set(groups or []),
            "hidden": hidden,
            "created": created,
        }

    def delete(self, rid):
        self.docs.pop(rid, None)

    def find(self, query_tokens, label, security, show_hidden, window=None):
        out = set()
        for rid, d in self.docs.items():
            if not (set(query_tokens) & d["tokens"]):
                continue
            if label is not None and f"/l/{label[0]}/{label[1]}" not in d["labels"]:
                continue
            if security is not None and d["groups"] and not (d["groups"] & set(security)):
                continue
            if d["hidden"] and not show_hidden:
                continue
            if window is not None:
                lo, hi = window
                if not (lo <= d["created"] <= hi):
                    continue
            out.add(rid)
        return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_find_matches_oracle_under_random_ops(tmp_path, seed):
    rng = np.random.default_rng(seed)
    driver = Driver(str(tmp_path / "db.sqlite"))
    node = EmbeddedNode(data_dir=str(tmp_path / "node"))
    kbs = KnowledgeBoxManager(driver, node)
    kbid = kbs.create(
        KnowledgeBoxConfig(
            slug="fuzz",
            hidden_resources_enabled=True,
            vectorsets={"m": VectorSetSpec(dimension=8)},
        )
    )
    processor = Processor(driver, node, kbs)
    search = SearchService(node, kbs, processor)
    oracle = Oracle()
    live: list[str] = []

    def random_payload(cls):
        body = " ".join(rng.choice(VOCAB, size=rng.integers(2, 6)))
        labels = [LABELSETS[i] for i in rng.choice(len(LABELSETS), size=rng.integers(0, 3), replace=False)]
        groups = list(rng.choice(GROUPS, size=rng.integers(0, 3), replace=False))
        hidden = bool(rng.random() < 0.2)
        vec = rng.standard_normal(8).astype(np.float32)
        vec /= np.linalg.norm(vec)
        payload = cls(
            title="t",
            texts={"t": TextFieldPayload(body=body)},
            usermetadata=UserMetadata(
                classifications=[Classification(labelset=s, label=l) for s, l in labels]
            ),
            security=ResourceSecurity(access_groups=groups) if groups else None,
            hidden=hidden,
            embeddings={"m": {"t": [SentenceEmbedding(start=0, end=len(body), vector=vec.tolist())]}},
        )
        brain_labels = [f"/l/{s}/{l}" for s, l in labels]
        return payload, body, brain_labels, groups, hidden

    for step in range(30):
        op = rng.random()
        if op < 0.55 or not live:
            payload, body, labels, groups, hidden = random_payload(CreateResourcePayload)
            created = float(rng.integers(1000, 2000))
            rid, _ = processor.create_resource(kbid, payload, created=created)
            live.append(rid)
            oracle.put(rid, body, labels, groups, hidden, created)
        elif op < 0.8:
            rid = live[int(rng.integers(len(live)))]
            payload, body, labels, groups, hidden = random_payload(UpdateResourcePayload)
            processor.update_resource(kbid, rid, payload)
            oracle.put(rid, body, labels, groups, hidden, oracle.docs[rid]["created"])
        else:
            rid = live.pop(int(rng.integers(len(live))))
            processor.delete_resource(kbid, rid)
            oracle.delete(rid)
        if rng.random() < 0.3:
            node.tick_background()  # merges interleave with queries

        if step % 3 != 2:
            continue
        node.wait_for_sync()
        q_tokens = list(rng.choice(VOCAB, size=rng.integers(1, 3), replace=False))
        label = LABELSETS[int(rng.integers(len(LABELSETS)))] if rng.random() < 0.4 else None
        security = list(rng.choice(GROUPS, size=1)) if rng.random() < 0.4 else None
        show_hidden = bool(rng.random() < 0.3)
        window = None
        if rng.random() < 0.4:
            lo = float(rng.integers(900, 1900))
            window = (lo, lo + float(rng.integers(100, 700)))
        req = FindRequest(
            query=" ".join(q_tokens),
            features=[SearchFeature.KEYWORD],
            top_k=50,
            filter_expression=(
                FilterExpression(literal=f"/l/{label[0]}/{label[1]}") if label else None
            ),
            security_groups=security,
            show_hidden=show_hidden,
            range_creation_start=window[0] if window else None,
            range_creation_end=window[1] if window else None,
        )
        got = set(search.find(kbid, req).resources)
        expect = oracle.find(q_tokens, label, security, show_hidden, window)
        assert got == expect, (
            step, q_tokens, label, security, show_hidden, got ^ expect
        )

        # semantic leg: with top_k >= corpus, the result SET is exactly the
        # filtered doc set (ranking cannot drop anything) — the same
        # constraints must hold on the vector index's filter path
        qv = rng.standard_normal(8).astype(np.float32)
        sem_req = FindRequest(
            query="",
            vector=(qv / np.linalg.norm(qv)).tolist(),
            features=[SearchFeature.SEMANTIC],
            top_k=100,
            filter_expression=req.filter_expression,
            security_groups=security,
            show_hidden=show_hidden,
        )
        got_sem = set(search.find(kbid, sem_req).resources)
        expect_sem = {
            rid
            for rid, d in oracle.docs.items()
            if (label is None or f"/l/{label[0]}/{label[1]}" in d["labels"])
            and (security is None or not d["groups"] or (d["groups"] & set(security)))
            and (show_hidden or not d["hidden"])
        }
        assert got_sem == expect_sem, (
            step, "semantic", label, security, show_hidden, got_sem ^ expect_sem
        )
