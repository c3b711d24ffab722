"""KB export / import / backups.

Parity: nucliadb/src/nucliadb/export_import/ (KB export to a stream of
records: resources + binaries + labels/entities; import consumer) and the
backup create/restore flows (backups/, ingest/service/writer.py:344-378).
Format: a msgpack record stream — [kind, *data] — written to bytes or to
object storage for backups.
"""

from __future__ import annotations

import io
import time
import uuid
from typing import Iterator, Optional

import msgpack

from ..ingest.processor import Processor
from ..models.api import CreateResourcePayload, KnowledgeBoxConfig
from ..storage import Storage
from .kb import KnowledgeBoxManager

FORMAT_VERSION = 1


def export_kb(kbs: KnowledgeBoxManager, processor: Processor, kbid: str) -> bytes:
    """Serialize a whole KB (config + resources) to one blob."""
    config = kbs.get_config(kbid)
    if config is None:
        raise KeyError(f"unknown kb {kbid}")
    buf = io.BytesIO()
    packer = msgpack.Packer()
    buf.write(packer.pack(["version", FORMAT_VERSION]))
    buf.write(packer.pack(["config", config.model_dump()]))
    for rid in processor.list_resources(kbid):
        payload = processor.get_payload(kbid, rid)
        meta = processor.get_meta(kbid, rid)
        if payload is None:
            continue
        buf.write(
            packer.pack(
                [
                    "resource",
                    rid,
                    payload.model_dump(),
                    {"created": meta.created if meta else 0.0},
                ]
            )
        )
    buf.write(packer.pack(["end"]))
    return buf.getvalue()


def iter_records(data: bytes) -> Iterator[list]:
    unpacker = msgpack.Unpacker(io.BytesIO(data))
    for record in unpacker:
        yield record


def import_kb(
    kbs: KnowledgeBoxManager,
    processor: Processor,
    data: bytes,
    *,
    kbid: Optional[str] = None,
    slug: Optional[str] = None,
) -> str:
    """Import an exported KB; creates a new KB unless ``kbid`` is given."""
    records = iter_records(data)
    head = next(records)
    if head[0] != "version" or head[1] > FORMAT_VERSION:
        raise ValueError(f"unsupported export format: {head}")
    target_kbid = kbid
    for record in records:
        kind = record[0]
        if kind == "config":
            if target_kbid is None:
                config = KnowledgeBoxConfig.model_validate(record[1])
                if slug is not None:
                    config.slug = slug
                target_kbid = kbs.create(config)
        elif kind == "resource":
            if target_kbid is None:
                raise ValueError("resource record before config")
            _, rid, payload_dict, meta_dict = record
            payload = CreateResourcePayload.model_validate(payload_dict)
            processor.create_resource(
                target_kbid, payload, rid=rid,
                created=(meta_dict or {}).get("created"),
            )
        elif kind == "end":
            break
    if target_kbid is None:
        raise ValueError("export contained no config record")
    return target_kbid


# ---- backups (object-store persisted exports) ------------------------------


def backup_key(backup_id: str) -> str:
    return f"backups/{backup_id}.export"


def create_backup(
    kbs: KnowledgeBoxManager,
    processor: Processor,
    storage: Storage,
    kbid: str,
    backup_id: str | None = None,
) -> str:
    backup_id = backup_id or f"{kbid}-{uuid.uuid4().hex[:8]}-{int(time.time())}"
    storage.put(backup_key(backup_id), export_kb(kbs, processor, kbid))
    return backup_id


def restore_backup(
    kbs: KnowledgeBoxManager,
    processor: Processor,
    storage: Storage,
    backup_id: str,
    *,
    slug: Optional[str] = None,
) -> str:
    data = storage.get(backup_key(backup_id))
    return import_kb(kbs, processor, data, slug=slug)


def list_backups(storage: Storage) -> list[str]:
    return [
        key[len("backups/"):-len(".export")]
        for key in storage.list("backups/")
        if key.endswith(".export")
    ]


def delete_backup(storage: Storage, backup_id: str) -> None:
    storage.delete(backup_key(backup_id))
