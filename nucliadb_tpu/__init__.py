"""nucliadb_tpu — a TPU-native hybrid search database.

A from-scratch rebuild of the capabilities of nuclia/nucliadb (the "AI search
database"): multi-tenant knowledge boxes, immutable object-store-backed index
segments, vector + full-text + fuzzy-paragraph + graph-relation + JSON indexes,
hybrid retrieval with rank fusion.

The index compute core — the part the reference implements in Rust (`nidx/`) —
is expressed here as JAX/XLA/Pallas programs over device-resident segment
arrays:

- vector scoring as blocked MXU matmuls with fused masked top-k,
- binary (RaBitQ-style) quantized scanning via packed-bit popcount dots,
- BM25 over device-resident CSR postings with scatter-add scoring,
- multi-shard scatter-gather as mesh-sharded execution + all-gather top-k.

The host plane (metadata, object store, ingestion bus, services, HTTP API)
mirrors the reference architecture (see SURVEY.md) with embedded-friendly
backends (sqlite metadata, filesystem/memory object store, in-process bus).
"""

__version__ = "0.1.0"
