"""Dataset export: persist train batches to disk partitions.

Parity with the reference's nucliadb_dataset package (export of train
streams to Arrow partitions): each partition is a msgpack file of batches
plus a manifest — a dependency-free equivalent consumable by any loader.
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


def export_trainset(
    processor: Processor,
    trainset: TrainSet,
    task: str,
    output_dir: str,
    *,
    batches_per_partition: int = 64,
) -> dict:
    """Write partition files + manifest; returns the manifest."""
    if task not in GENERATORS:
        raise ValueError(f"unknown train task {task!r}; options: {sorted(GENERATORS)}")
    os.makedirs(output_dir, exist_ok=True)
    generator = GENERATORS[task](processor, trainset)
    partitions = []
    current: list[dict] = []
    examples = 0

    def flush():
        nonlocal current
        if not current:
            return
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
        "partitions": partitions,
        "examples": examples,
    }
    with open(os.path.join(output_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def load_partition(path: str) -> list[dict]:
    with open(path, "rb") as f:
        return msgpack.unpackb(f.read())
