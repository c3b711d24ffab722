"""Generic task framework over the bus.

Parity: nucliadb/src/nucliadb/tasks/ (producer/consumer pairs on NATS
streams, tasks/consumer.py:40-111): registered callbacks consume typed task
messages with at-least-once semantics and poison-message skipping.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable

from ..bus import BusMessage, EmbeddedBus

TASK_STREAM = "ndb_tasks"


@dataclass
class TaskMessage:
    kbid: str
    payload: dict


class TaskProducer:
    def __init__(self, bus: EmbeddedBus, name: str):
        self.bus = bus
        self.name = name

    def send(self, kbid: str, **payload) -> int:
        return self.bus.publish(
            TASK_STREAM,
            f"task.{self.name}",
            json.dumps({"kbid": kbid, "payload": payload}).encode(),
        )


class TaskConsumer:
    def __init__(self, bus: EmbeddedBus, name: str, callback: Callable[[TaskMessage], None]):
        self.bus = bus
        self.name = name
        self.callback = callback
        self.consumer = f"task_consumer_{name}"

    def work_once(self) -> bool:
        msg = self.bus.next(TASK_STREAM, self.consumer, subject_prefix=f"task.{self.name}")
        if msg is None:
            return False
        try:
            data = json.loads(msg.payload)
            self.callback(TaskMessage(kbid=data["kbid"], payload=data["payload"]))
        except Exception:
            self.bus.nak(TASK_STREAM, self.consumer, msg.seq)
            raise
        self.bus.ack(TASK_STREAM, self.consumer, msg.seq)
        return True

    def drain(self) -> int:
        n = 0
        while self.work_once():
            n += 1
        return n
