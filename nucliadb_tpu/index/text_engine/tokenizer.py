"""Tokenization: lowercase alphanumeric word splitting.

Matches tantivy's default ``SimpleTokenizer`` + ``LowerCaser`` +
``RemoveLongFilter(40)`` pipeline the reference indexes with
(nidx_text/src/schema.rs TEXT fields, nidx_paragraph schema): split on
non-alphanumeric (unicode-aware), lowercase, drop tokens longer than 40
chars. Token positions are token ordinals (for phrase queries).
"""

from __future__ import annotations

import re
import unicodedata

try:  # native fast path (see native/postings.cpp); built via native/build.py
    import nucliadb_tpu_native as _native
except ImportError:  # pure-Python fallback with matching semantics
    _native = None

_WORD_RE = re.compile(r"\w+", re.UNICODE)
MAX_TOKEN_LEN = 40


def _normalize(token: str) -> str:
    return token.lower()


def tokenize(text: str) -> list[str]:
    if _native is not None:
        return [t for t, _ in _native.tokenize_with_positions(text)]
    return [
        _normalize(m.group(0))
        for m in _WORD_RE.finditer(text)
        if len(m.group(0)) <= MAX_TOKEN_LEN and not m.group(0).isspace()
    ]


def tokenize_with_positions(text: str) -> list[tuple[str, int]]:
    """(token, ordinal position) pairs — positions are token ordinals."""
    if _native is not None:
        return _native.tokenize_with_positions(text)
    out = []
    pos = 0
    for m in _WORD_RE.finditer(text):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LEN:
            pos += 1
            continue
        out.append((_normalize(tok), pos))
        pos += 1
    return out


def strip_diacritics(text: str) -> str:
    """ASCII-folding used for suggest/fuzzy normalization."""
    return "".join(
        c for c in unicodedata.normalize("NFD", text) if unicodedata.category(c) != "Mn"
    )
