"""Audit reporting: search/modify/delete events to an audit stream.

Parity: nucliadb_utils/src/nucliadb_utils/audit/stream.py:66-163 — audit
events are fire-and-forget messages on a dedicated stream; consumers ship
them to billing/analytics. Here they ride the embedded bus.
"""

from __future__ import annotations

import json
import time
from enum import Enum
from typing import Optional

from ..bus import EmbeddedBus

AUDIT_STREAM = "ndb_audit"


class AuditType(str, Enum):
    VISITED = "visited"
    MODIFIED = "modified"
    DELETED = "deleted"
    NEW = "new"
    SEARCH = "search"
    SUGGEST = "suggest"
    CHAT = "chat"
    STORAGE = "storage"


class AuditStream:
    def __init__(self, bus: Optional[EmbeddedBus] = None):
        self.bus = bus

    def report(
        self,
        *,
        kbid: str,
        audit_type: AuditType,
        rid: str = "",
        user: str = "",
        client_type: str = "",
        duration_ms: Optional[float] = None,
        detail: Optional[dict] = None,
    ) -> None:
        if self.bus is None:
            return
        event = {
            "kbid": kbid,
            "type": audit_type.value,
            "rid": rid,
            "user": user,
            "client_type": client_type,
            "when": time.time(),
            "detail": detail or {},
        }
        if duration_ms is not None:
            event["duration_ms"] = round(duration_ms, 3)
        self.bus.publish(AUDIT_STREAM, f"audit.{kbid}", json.dumps(event).encode())

    def search(
        self,
        kbid: str,
        query: str,
        results: int,
        user: str = "",
        client_type: str = "",
        duration_ms: Optional[float] = None,
    ) -> None:
        self.report(
            kbid=kbid,
            audit_type=AuditType.SEARCH,
            user=user,
            client_type=client_type,
            duration_ms=duration_ms,
            detail={"query": query, "results": results},
        )

    def suggest(
        self, kbid: str, query: str, user: str = "", client_type: str = "",
        duration_ms: Optional[float] = None,
    ) -> None:
        self.report(
            kbid=kbid, audit_type=AuditType.SUGGEST, user=user,
            client_type=client_type, duration_ms=duration_ms,
            detail={"query": query},
        )

    def chat(
        self,
        kbid: str,
        question: str,
        answer: str,
        *,
        rephrased_question: str = "",
        status: str = "",
        user: str = "",
        client_type: str = "",
        duration_ms: Optional[float] = None,
    ) -> None:
        """RAG interaction report (parity: audit stream ChatAudit — question,
        rephrased question, answer, status code)."""
        self.report(
            kbid=kbid,
            audit_type=AuditType.CHAT,
            user=user,
            client_type=client_type,
            duration_ms=duration_ms,
            detail={
                "question": question,
                "rephrased_question": rephrased_question,
                "answer": answer[:2048],
                "status": status,
            },
        )
