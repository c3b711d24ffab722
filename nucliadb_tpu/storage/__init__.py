"""Object storage: segments and resource blobs.

Parity with the reference's object-store abstraction
(nidx/src/segment_store.rs + nucliadb_utils/storages/): a minimal Storage
interface with local-filesystem and in-memory backends (the in-memory one
mirrors the reference's test setup, nidx/tests using object_store::memory).
Cloud backends (S3/GCS/Azure) slot behind the same interface; this image is
egress-free so they are intentionally not implemented here.
"""

from .storage import LocalStorage, MemoryStorage, Storage

__all__ = ["Storage", "LocalStorage", "MemoryStorage"]
