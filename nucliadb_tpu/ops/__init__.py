"""Device compute kernels (JAX/XLA/Pallas) for the index core.

These are the TPU-native replacements for the reference's hot Rust loops:

- ``topk``     — masked/merged top-k primitives (replaces Fssc fixed-size
  top-k heaps, nidx_vector/src/searcher.rs:150-199, and the scatter-gather
  merge, nidx/src/searcher/shard_merge.rs).
- ``distance`` — exact similarity scans as blocked MXU matmuls (replaces the
  brute-force path, nidx_vector/src/segment.rs:477-623).
- ``quant``    — 1-bit sign quantization with bit-plane popcount dots and
  exact rerank (replaces RaBitQ, nidx_vector/src/vector_types/rabitq.rs).
- ``bm25``     — CSR-postings BM25 scoring via scatter-add (replaces tantivy
  scoring in nidx_text / nidx_paragraph).
- ``maxsim``   — multivector MaxSim rescoring (replaces
  nidx_vector/src/multivector.rs).
"""
