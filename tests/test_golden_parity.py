"""Golden parity fixtures: hand-derived BM25 scores + fuzzy edge cases.

Unlike the python oracle in test_text_engine.py (which shares tokenizer and
formula assumptions with the engine), these values are derived by hand from
the Lucene/tantivy BM25 definition the reference uses (k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5)); tf-norm =
tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))) and pinned as literals, so a
formula drift on either side breaks the test. Fuzzy cases pin tantivy's
automaton semantics: OSA distance with transpositions costing 1
(nidx_paragraph/src/query_parser/fuzzy_parser.rs:73), MIN_FUZZY_LEN=3
exact-only short tokens (fuzzy_parser.rs:35,76).
"""

import numpy as np
import pytest

from nucliadb_tpu.index.text_engine import (
    DeviceTextEngine,
    TextQuery,
    build_segment,
    open_text_segment,
)
from nucliadb_tpu.index.text_engine.builder import DocEntry
from nucliadb_tpu.index.text_engine.fuzzy import FuzzyIndex, osa_leq
from nucliadb_tpu.types import Seq

# corpus: d0 "the cat sat" (dl 3), d1 "the cat cat meowed loudly" (dl 5),
# d2 "dogs bark" (dl 2); N=3, avgdl=10/3.
#
# Derivation for query "cat" (df=2):
#   idf        = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)      = 0.4700036292
#   d0: tf=1, dl=3 -> dl/avgdl=0.9
#       tfn    = 1*2.2 / (1 + 1.2*(0.25 + 0.75*0.9)) = 2.2/2.11 = 1.0426540284
#       score  = 0.4700036292 * 1.0426540284          = 0.4900511774
#   d1: tf=2, dl=5 -> dl/avgdl=1.5
#       tfn    = 2*2.2 / (2 + 1.2*(0.25 + 1.125)) = 4.4/3.65   = 1.2054794521
#       score  = 0.4700036292 * 1.2054794521          = 0.5665797174
# Query "cat sat": "sat" df=1 -> idf = ln(1 + 2.5/1.5) = ln(8/3) = 0.9808292530
#   d0 score = 0.4900511774 + 0.9808292530*1.0426540284 = 1.5127167493
GOLDEN_DOCS = [
    ("d0/f", "the cat sat"),
    ("d1/f", "the cat cat meowed loudly"),
    ("d2/f", "dogs bark"),
]


@pytest.fixture()
def golden_engine(tmp_path):
    entries = [DocEntry(key=k, text=t) for k, t in GOLDEN_DOCS]
    meta = build_segment(str(tmp_path / "g"), entries, kind="text")
    return DeviceTextEngine([(open_text_segment(meta.path), Seq(1))])


def _scores(engine, text, **kw):
    hits, _ = engine.search(TextQuery(text=text, top_k=10, **kw))
    return {h.key: h.score for h in hits}


def test_bm25_golden_single_term(golden_engine):
    got = _scores(golden_engine, "cat")
    assert set(got) == {"d0/f", "d1/f"}
    np.testing.assert_allclose(got["d0/f"], 0.4900511774, rtol=1e-6)
    np.testing.assert_allclose(got["d1/f"], 0.5665797174, rtol=1e-6)


def test_bm25_golden_two_terms(golden_engine):
    got = _scores(golden_engine, "cat sat")
    np.testing.assert_allclose(got["d0/f"], 1.5127167493, rtol=1e-6)
    np.testing.assert_allclose(got["d1/f"], 0.5665797174, rtol=1e-6)
    # ranking flips vs single-term: d0 now outranks d1
    assert got["d0/f"] > got["d1/f"]


def test_bm25_golden_repeated_query_term_counts_once(golden_engine):
    # tantivy parses "cat cat" into one term occurrence per distinct term
    got = _scores(golden_engine, "cat cat")
    np.testing.assert_allclose(got["d0/f"], 0.4900511774, rtol=1e-6)


# --------------------------------------------------------------------------
# fuzzy automaton semantics
# --------------------------------------------------------------------------


def test_osa_transposition_costs_one():
    assert osa_leq("cieling", "ceiling", 1)  # adjacent swap
    assert osa_leq("quikc", "quick", 1)
    assert not osa_leq("cliieng", "ceiling", 1)
    # plain Levenshtein would need 2 for a swap; OSA must accept at 1
    assert osa_leq("ab", "ba", 1)
    # non-adjacent moves still cost 2
    assert not osa_leq("abc", "cba", 1)


def test_fuzzy_index_matches_transpositions():
    fi = FuzzyIndex(["ceiling", "dog", "quick"])
    assert "ceiling" in fi.expand("cieling", 1)
    assert "quick" in fi.expand("quikc", 1)


def test_fuzzy_min_len_exact_only():
    fi = FuzzyIndex(["ab", "ax", "abc"])
    # len<3 tokens: exact match only (no "ax" for "ab")
    assert fi.expand("ab", 1) == ["ab"]
    assert fi.expand("zz", 1) == []
    # len>=3 fuzz normally
    assert "abc" in fi.expand("abd", 1)


def test_fuzzy_edge_cases():
    fi = FuzzyIndex(["kitten", "sitting", "café", "cafes", "flour"])
    # distance 2 must NOT match at d=1
    assert "sitting" not in fi.expand("kitten", 1)
    # unicode substitution at distance 1
    assert "café" in fi.expand("cafe", 1)
    # prefix insert/delete at the boundary
    assert "flour" in fi.expand("four", 1)
    assert "flour" in fi.expand("flours", 1)


def test_engine_fuzzy_transposition_end_to_end(tmp_path):
    entries = [DocEntry(key="r/f", text="the ceiling is high")]
    meta = build_segment(str(tmp_path / "s"), entries, kind="paragraph")
    engine = DeviceTextEngine([(open_text_segment(meta.path), Seq(1))])
    hits, _ = engine.search(TextQuery(text="cieling", top_k=5, fuzzy=True))
    assert [h.key for h in hits] == ["r/f"]
