"""Device compute kernels (JAX/XLA/Pallas) for the index core.

These are the TPU-native replacements for the reference's hot Rust loops:

- ``topk``     — masked/merged top-k primitives (replaces Fssc fixed-size
  top-k heaps, nidx_vector/src/searcher.rs:150-199, and the scatter-gather
  merge, nidx/src/searcher/shard_merge.rs).
- ``distance`` — exact similarity scans as blocked MXU matmuls (replaces the
  brute-force path, nidx_vector/src/segment.rs:477-623).
- ``quant``    — 1-bit sign quantization with bit-plane popcount dots and
  exact rerank (replaces RaBitQ, nidx_vector/src/vector_types/rabitq.rs).
- ``hnsw``     — batched proximity-graph build + fixed-trip beam search
  (replaces the HNSW core, nidx_vector/src/hnsw/).
- ``ivf``      — matmul k-means + cluster-blocked scans (no reference
  analogue; the MXU-native structure for very large corpora).
- ``fusion``   — on-device reciprocal rank fusion.

BM25 scoring lives with its postings layout in
``index/text_engine/engine.py`` and multivector MaxSim with the paragraph
slot layout in ``index/vector/device.py`` — both are device kernels in the
same sense, colocated with the data structures they scan.
"""
