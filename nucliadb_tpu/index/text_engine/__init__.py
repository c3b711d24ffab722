"""Shared BM25 full-text engine for the text and paragraph indexes.

From-scratch replacement for the reference's tantivy adapter + schemas
(nidx_tantivy, nidx_text, nidx_paragraph). No tantivy exists here; instead:

- host: tokenizer, per-segment CSR postings builder, term dictionaries,
  fuzzy (Levenshtein) expansion, phrase verification via positions,
  facet counting;
- device: BM25 scoring over consolidated *tiered* postings (padded
  [terms, bucket_len] matrices per posting-length tier → row gathers +
  one small scatter-add per query) with dense tf arrays for
  stopword-grade terms (the most frequent terms become pure elementwise
  work instead of giant scatters — the TPU counterpart of WAND skipping).
"""

from .tokenizer import tokenize, tokenize_with_positions
from .builder import TextSegmentData, build_segment, open_text_segment
from .engine import DeviceTextEngine, TextQuery, TextHit

__all__ = [
    "tokenize",
    "tokenize_with_positions",
    "TextSegmentData",
    "build_segment",
    "open_text_segment",
    "DeviceTextEngine",
    "TextQuery",
    "TextHit",
]
