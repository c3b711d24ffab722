"""Native extension equivalence + performance tests (skipped if not built)."""

import time

import numpy as np
import pytest

native = pytest.importorskip("nucliadb_tpu_native")

from nucliadb_tpu.index.text_engine.builder import DocEntry, build_segment, open_text_segment
from nucliadb_tpu.index.text_engine.tokenizer import MAX_TOKEN_LEN

import re

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def py_tokenize_with_positions(text):
    out = []
    pos = 0
    for m in _WORD_RE.finditer(text):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LEN:
            pos += 1
            continue
        out.append((tok.lower(), pos))
        pos += 1
    return out


@pytest.mark.parametrize(
    "text",
    [
        "Hello, World! it's 42",
        "the quick  brown... FOX_1 jumps-over (the) lazy dog",
        "word " + "x" * 50 + " tail",  # long token dropped, position advances
        "café über señor",  # accented words survive intact
        "",
        "    ",
    ],
)
def test_native_tokenizer_matches_python(text):
    assert native.tokenize_with_positions(text) == py_tokenize_with_positions(text)


def test_native_postings_equivalence(tmp_path, rng):
    words = ["alpha", "beta", "gamma", "delta", "fox", "dog", "markets", "tpu"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 30)).tolist())
        for _ in range(50)
    ]
    docs = [DocEntry(key=f"r{i:03d}/f", text=t) for i, t in enumerate(texts)]

    import nucliadb_tpu.index.text_engine.builder as builder_mod

    meta_native = build_segment(str(tmp_path / "nat"), docs, kind="text")
    saved = builder_mod._native
    builder_mod._native = None
    try:
        meta_py = build_segment(str(tmp_path / "py"), docs, kind="text")
    finally:
        builder_mod._native = saved

    a = open_text_segment(meta_native.path)
    b = open_text_segment(meta_py.path)
    assert a.terms == b.terms
    np.testing.assert_array_equal(np.asarray(a.postings_offsets), np.asarray(b.postings_offsets))
    np.testing.assert_array_equal(np.asarray(a.postings_docs), np.asarray(b.postings_docs))
    np.testing.assert_array_equal(np.asarray(a.postings_tfs), np.asarray(b.postings_tfs))
    np.testing.assert_array_equal(np.asarray(a.positions), np.asarray(b.positions))
    np.testing.assert_array_equal(np.asarray(a.dlen), np.asarray(b.dlen))


def test_native_postings_speed(rng):
    words = [f"word{i}" for i in range(2000)]
    texts = [
        " ".join(rng.choice(words, size=200).tolist()) for _ in range(200)
    ]
    t0 = time.time()
    native.build_postings(texts)
    t_native = time.time() - t0

    from nucliadb_tpu.index.text_engine.tokenizer import tokenize_with_positions

    t0 = time.time()
    term_docs = {}
    for did, text in enumerate(texts):
        for tok, pos in py_tokenize_with_positions(text):
            term_docs.setdefault(tok, {}).setdefault(did, []).append(pos)
    t_py = time.time() - t0
    assert t_native < t_py, (t_native, t_py)


def test_tokenizer_parity_fuzz():
    """Native and pure-Python tokenizers agree byte-for-byte on adversarial
    inputs (NBSP word-chars, multi-byte length caps, mixed scripts)."""
    import random

    import nucliadb_tpu.index.text_engine.tokenizer as T

    if T._native is None:
        import pytest

        pytest.skip("native module not built")
    rng = random.Random(0)
    alphabet = list("abz019_ .,!") + [" ", "é", "漢", "x" * 50, "é" * 25]
    saved = T._native
    try:
        for _ in range(500):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
            native = saved.tokenize_with_positions(s)
            T._native = None
            py = T.tokenize_with_positions(s)
            T._native = saved
            assert native == py, s.encode()
    finally:
        T._native = saved


def test_phrase_match_batch_native_vs_python(tmp_path):
    """The native verifier must agree with the python positions walk on
    every doc, including absent terms and multi-segment engines."""
    import numpy as np

    from nucliadb_tpu.index.text_engine import (
        DeviceTextEngine,
        build_segment,
        open_text_segment,
    )
    from nucliadb_tpu.index.text_engine.builder import DocEntry
    from nucliadb_tpu.types import Seq

    docs = [
        ("r1/f", "the quick brown fox jumps", []),
        ("r2/f", "quick brown dogs sleep", []),
        ("r3/f", "brown quick inverted order", []),
        ("r4/f", "nothing relevant", []),
        ("r5/f", "leading words then quick brown fox again quick brown", []),
    ]
    segs = []
    for si, chunk in enumerate((docs[:3], docs[3:])):
        entries = [DocEntry(key=k, text=t, facets=f, columns={}) for k, t, f in chunk]
        meta = build_segment(str(tmp_path / f"pm{si}"), entries, kind="paragraph")
        segs.append((open_text_segment(meta.path), Seq(si + 1)))
    engine = DeviceTextEngine(segs)

    all_docs = list(range(5))
    for phrase in (["quick", "brown"], ["quick", "brown", "fox"], ["fox", "jumps"],
                   ["missingterm"], ["brown", "quick"]):
        got = engine.phrase_match_many(all_docs, phrase)
        expect = [engine.phrase_match(d, phrase) for d in all_docs]
        assert got == expect, (phrase, got, expect)
    # sanity on semantics, not just self-agreement
    assert engine.phrase_match_many(all_docs, ["quick", "brown"]) == [
        True, True, False, False, True
    ]
