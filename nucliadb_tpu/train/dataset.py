"""Dataset export: persist train batches to disk partitions.

Parity with the reference's nucliadb_dataset package
(nucliadb_dataset/src/nucliadb_dataset/dataset.py — export of Train gRPC
streams to one Arrow IPC file per partition plus a manifest): partitions
are Arrow streaming-format files (``pyarrow.ipc.new_stream``) with a
schema derived from the task's batch type, so any Arrow/HuggingFace loader
consumes them directly. A msgpack format is kept as a dependency-free
fallback (``format="msgpack"``).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from typing import Callable, Iterator

import msgpack

from ..ingest.processor import Processor
from .generators import TrainSet

GENERATORS: dict[str, Callable] = {}

# Arrow encode/write calls run under one process-wide lock: exports fire from
# HTTP server worker threads, and concurrent pyarrow conversions have produced
# a rare interpreter segfault under the full-suite thread mix. Export
# throughput is disk-bound anyway, so serializing costs nothing measurable.
import threading as _threading

_ARROW_LOCK = _threading.Lock()


def _register():
    from . import generators as g

    GENERATORS.update(
        {
            "paragraph_classification": g.paragraph_classification_batches,
            "field_classification": g.field_classification_batches,
            "sentences": g.sentence_batches,
            "token_classification": g.token_classification_batches,
            "question_answers": g.qa_batches,
            "sentence_classification": g.sentence_classification_batches,
            "field_streaming": g.field_streaming_batches,
            "paragraph_streaming": g.paragraph_streaming_batches,
            "image_classification": g.image_classification_batches,
        }
    )


_register()


def _arrow_type(value):
    """Arrow type for one column's sample value (str | list[str] |
    list[list[str]] columns are what the batch dataclasses contain)."""
    import pyarrow as pa

    if value and isinstance(value[0], list):
        if value[0] and isinstance(value[0][0], list):
            return pa.list_(pa.list_(pa.string()))
        return pa.list_(pa.string())
    return pa.string()


def _arrow_schema(columns: dict):
    import pyarrow as pa

    return pa.schema([(name, _arrow_type(col)) for name, col in columns.items()])


def export_trainset(
    processor: Processor,
    trainset: TrainSet,
    task: str,
    output_dir: str,
    *,
    batches_per_partition: int = 64,
    format: str = "arrow",
) -> dict:
    """Write partition files + manifest; returns the manifest.

    ``format="arrow"`` (default) writes Arrow IPC streaming files — the
    reference dataset layout; ``format="msgpack"`` writes msgpack lists.
    """
    if task not in GENERATORS:
        raise ValueError(f"unknown train task {task!r}; options: {sorted(GENERATORS)}")
    if format not in ("arrow", "msgpack"):
        raise ValueError(f"unknown format {format!r}")
    os.makedirs(output_dir, exist_ok=True)
    generator = GENERATORS[task](processor, trainset)
    partitions: list[str] = []
    current: list[dict] = []
    examples = 0

    def flush():
        nonlocal current
        if not current:
            return
        if format == "arrow":
            import pyarrow as pa

            name = f"part-{len(partitions):05d}.arrow"
            with _ARROW_LOCK:
                schema = _arrow_schema(current[0])
                with pa.OSFile(os.path.join(output_dir, name), "wb") as sink:
                    with pa.ipc.new_stream(sink, schema) as writer:
                        for d in current:
                            writer.write_batch(
                                pa.record_batch(
                                    [pa.array(col, type=schema.field(k).type) for k, col in d.items()],
                                    schema=schema,
                                )
                            )
        else:
            name = f"part-{len(partitions):05d}.msgpack"
            with open(os.path.join(output_dir, name), "wb") as f:
                f.write(msgpack.packb(current))
        partitions.append(name)
        current = []

    for batch in generator:
        d = asdict(batch)
        examples += len(next(iter(d.values())))
        current.append(d)
        if len(current) >= batches_per_partition:
            flush()
    flush()
    manifest = {
        "kbid": trainset.kbid,
        "task": task,
        "batch_size": trainset.batch_size,
        "format": format,
        "partitions": partitions,
        "examples": examples,
    }
    with open(os.path.join(output_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def stream_trainset(
    processor: Processor, trainset: TrainSet, task: str
) -> Iterator[bytes]:
    """Yield one Arrow IPC stream (schema message + record batches) as byte
    chunks — the HTTP body of the reference's train-data endpoint
    (nucliadb/src/nucliadb/train/api/v1/shards.py object_get_response
    streams generate_train_data as application/octet-stream)."""
    import io

    import pyarrow as pa

    if task not in GENERATORS:
        raise ValueError(f"unknown train task {task!r}; options: {sorted(GENERATORS)}")
    sink = io.BytesIO()
    writer = None
    schema = None
    for batch in GENERATORS[task](processor, trainset):
        d = asdict(batch)
        with _ARROW_LOCK:
            if writer is None:
                schema = _arrow_schema(d)
                writer = pa.ipc.new_stream(sink, schema)
            writer.write_batch(
                pa.record_batch(
                    [pa.array(col, type=schema.field(k).type) for k, col in d.items()],
                    schema=schema,
                )
            )
        if sink.tell():
            yield sink.getvalue()
            sink.seek(0)
            sink.truncate()
    if writer is not None:
        writer.close()
        if sink.tell():
            yield sink.getvalue()


def load_partition(path: str) -> list[dict]:
    """Read one partition back as a list of column-dict batches (both
    formats)."""
    if path.endswith(".arrow"):
        import pyarrow as pa

        out = []
        with pa.OSFile(path, "rb") as source:
            with pa.ipc.open_stream(source) as reader:
                for rb in reader:
                    out.append({name: rb.column(i).to_pylist() for i, name in enumerate(rb.schema.names)})
        return out
    with open(path, "rb") as f:
        return msgpack.unpackb(f.read())
