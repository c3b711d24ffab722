"""Storage backends + segment pack/unpack.

Segments are directories; they travel through object storage as single
tar blobs (parity: nidx/src/segment_store.rs:1-116 pack_and_upload /
download & unpack).
"""

from __future__ import annotations

import io
import os
import shutil
import tarfile
from typing import Iterable, Optional, Protocol


class Storage(Protocol):
    def put(self, key: str, data: bytes) -> None: ...

    def get(self, key: str) -> bytes: ...

    def exists(self, key: str) -> bool: ...

    def delete(self, key: str) -> None: ...

    def list(self, prefix: str = "") -> Iterable[str]: ...


class MemoryStorage:
    """In-memory object store (tests / standalone ephemerals)."""

    def __init__(self) -> None:
        self._blobs: dict[str, bytes] = {}

    def put(self, key: str, data: bytes) -> None:
        self._blobs[key] = bytes(data)

    def get(self, key: str) -> bytes:
        return self._blobs[key]

    def exists(self, key: str) -> bool:
        return key in self._blobs

    def delete(self, key: str) -> None:
        self._blobs.pop(key, None)

    def list(self, prefix: str = "") -> Iterable[str]:
        return sorted(k for k in self._blobs if k.startswith(prefix))


class LocalStorage:
    """Filesystem object store rooted at a directory."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        path = os.path.normpath(os.path.join(self.root, key))
        root = os.path.normpath(self.root)
        # separator-aware containment: a bare startswith lets '../store-evil'
        # pass for root '/data/store' (sibling sharing the name as a prefix)
        if path != root and not path.startswith(root + os.sep):
            raise ValueError(f"key escapes storage root: {key}")
        return path

    def put(self, key: str, data: bytes) -> None:
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def put_stream(self, key: str, chunks: Iterable[bytes]) -> None:
        """Write an object from an iterator without materializing it
        (TUS finalize concatenates multi-GB uploads through this)."""
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            for chunk in chunks:
                f.write(chunk)
        os.replace(tmp, path)

    def get(self, key: str) -> bytes:
        try:
            with open(self._path(key), "rb") as f:
                return f.read()
        except FileNotFoundError:
            raise KeyError(key)  # missing keys raise KeyError on EVERY backend

    def exists(self, key: str) -> bool:
        return os.path.isfile(self._path(key))

    def delete(self, key: str) -> None:
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass

    def list(self, prefix: str = "") -> Iterable[str]:
        out = []
        for dirpath, _, files in os.walk(self.root):
            for name in files:
                full = os.path.join(dirpath, name)
                key = os.path.relpath(full, self.root)
                if key.startswith(prefix):
                    out.append(key)
        return sorted(out)


def pack_segment(segment_dir: str) -> bytes:
    """Tar a segment directory into one blob (parity: segment_store.rs pack).

    USTAR format: the default PAX writer spends most of the ingest hot
    path's packing time generating pax headers (measured ~45% of
    create_resource); segment file names/sizes always fit USTAR, and the
    reader auto-detects either format. GNU format covers the >8 GiB
    fallback."""
    buf = io.BytesIO()
    try:
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
            for name in sorted(os.listdir(segment_dir)):
                tar.add(os.path.join(segment_dir, name), arcname=name)
    except ValueError:  # a field overflowed USTAR limits
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as tar:
            for name in sorted(os.listdir(segment_dir)):
                tar.add(os.path.join(segment_dir, name), arcname=name)
    return buf.getvalue()


def unpack_segment(data: bytes, target_dir: str) -> None:
    os.makedirs(target_dir, exist_ok=True)
    with tarfile.open(fileobj=io.BytesIO(data), mode="r") as tar:
        tar.extractall(target_dir, filter="data")


def upload_segment(storage: Storage, key: str, segment_dir: str) -> int:
    data = pack_segment(segment_dir)
    storage.put(key, data)
    return len(data)


def download_segment(storage: Storage, key: str, target_dir: str) -> None:
    marker = os.path.join(target_dir, ".complete")
    if os.path.exists(marker):
        return  # already synced (searcher warm resume, sync.rs diff)
    # a non-empty dir WITHOUT the marker is a half-extracted crash leftover:
    # re-extract from scratch (treating it as synced served partial files)
    if os.path.isdir(target_dir):
        shutil.rmtree(target_dir, ignore_errors=True)
    unpack_segment(storage.get(key), target_dir)
    with open(marker, "w") as f:
        f.write("ok")


def delete_local(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)
