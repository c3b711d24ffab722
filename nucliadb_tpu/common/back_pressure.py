"""Back-pressure: reject writes when the ingest pipeline lags.

Parity: nucliadb/src/nucliadb/common/back_pressure/materializer.py:48-210 —
the writer consults queue depths (NATS consumer pending counts there; bus
pending / unsynced index requests here) and returns 429 with a
``try_after`` estimate when thresholds are exceeded.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

from ..bus import EmbeddedBus
from ..metadata import MetadataStore


@dataclass
class BackPressureSettings:
    max_indexing_pending: int = 1000
    max_ingest_pending: int = 1000
    estimated_rate_per_s: float = 50.0


class TryAfterError(Exception):
    def __init__(self, try_after: float, reason: str):
        self.try_after = try_after
        self.reason = reason
        super().__init__(f"back pressure: {reason}; retry after {try_after:.1f}s")


class BackPressureMaterializer:
    def __init__(
        self,
        metadata: MetadataStore,
        bus: Optional[EmbeddedBus] = None,
        settings: Optional[BackPressureSettings] = None,
    ):
        self.metadata = metadata
        self.bus = bus
        self.settings = settings or BackPressureSettings()

    def indexing_pending(self) -> int:
        # unacked index requests = operations committed but not fully indexed
        floor = self.metadata.ack_floor()
        last = self.metadata.last_seq()
        return max(int(last) - int(floor), 0)

    def ingest_pending(self, stream: str = "ndb_ingest", consumer: str = "ingest_0") -> int:
        if self.bus is None:
            return 0
        return self.bus.pending(stream, consumer)

    def check_indexing(self) -> None:
        pending = self.indexing_pending()
        if pending > self.settings.max_indexing_pending:
            raise TryAfterError(
                pending / self.settings.estimated_rate_per_s, "indexing behind"
            )

    def check_ingest(self) -> None:
        pending = self.ingest_pending()
        if pending > self.settings.max_ingest_pending:
            raise TryAfterError(
                pending / self.settings.estimated_rate_per_s, "ingest behind"
            )
