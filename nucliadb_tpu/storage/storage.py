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


def _ustar_header(name: str, size: int, mtime: int) -> "bytes | None":
    """One 512-byte USTAR member header, or None when a field overflows
    the format (name > 100 bytes, size >= 8 GiB) — caller falls back to
    the tarfile writer."""
    nb = name.encode()
    if len(nb) > 100 or size >= 8 ** 11:
        return None
    h = bytearray(512)
    h[0 : len(nb)] = nb
    h[100:108] = b"0000644\x00"  # mode
    h[108:116] = b"0000000\x00"  # uid
    h[116:124] = b"0000000\x00"  # gid
    h[124:136] = b"%011o\x00" % size
    h[136:148] = b"%011o\x00" % max(mtime, 0)
    h[148:156] = b"        "  # chksum computed over spaces
    h[156] = 0x30  # '0' = regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    h[148:156] = b"%06o\x00 " % sum(h)
    return bytes(h)


def pack_segment(segment_dir: str) -> bytes:
    """Tar a segment directory into one blob (parity: segment_store.rs pack).

    Raw USTAR writer: Python tarfile spends ~150 µs of interpreter work
    PER MEMBER (measured ~45% of create_resource on the ingest hot path
    even in USTAR mode); segment archives are a handful of flat files, so
    the headers are built directly. The output is plain USTAR —
    unpack_segment's tarfile reader is unchanged. tarfile/GNU covers the
    overflow fallback (names > 100 bytes, members >= 8 GiB)."""
    import stat as _stat

    parts: list[bytes] = []
    for name in sorted(os.listdir(segment_dir)):
        path = os.path.join(segment_dir, name)
        st = os.stat(path)
        if not _stat.S_ISREG(st.st_mode):
            break  # subdirectory/special file: tarfile fallback handles it
        hdr = _ustar_header(name, st.st_size, int(st.st_mtime))
        if hdr is None:
            break
        with open(path, "rb") as f:
            data = f.read()
        parts.append(hdr)
        parts.append(data)
        pad = (-len(data)) % 512
        if pad:
            parts.append(b"\x00" * pad)
    else:
        parts.append(b"\x00" * 1024)  # end-of-archive
        return b"".join(parts)
    buf = io.BytesIO()  # overflow fallback: GNU handles long names/sizes
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
