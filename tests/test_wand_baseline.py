"""C++ BM25+WAND baseline: differential vs a dense brute-force oracle.

WAND is pruned evaluation, not approximation — its top-k must equal exact
scoring's top-k on every corpus (Broder et al. 2003 invariant). Fuzzed over
random zipf corpora, query shapes (exact / typo'd / multi-term / absent
terms), and k values."""

import numpy as np
import pytest

pytest.importorskip("nucliadb_tpu_native")

from tools.wand_baseline import WandBaseline  # noqa: E402

VOCAB = [
    "quick", "brown", "fox", "lazy", "dog", "search", "database", "index",
    "vector", "kernel", "shard", "merge", "tensor", "yield", "quirk",
]


def _corpus(rng, n_docs):
    texts = []
    for _ in range(n_docs):
        n = int(rng.integers(3, 30))
        texts.append(" ".join(rng.choice(VOCAB, size=n)))
    return texts


def _check(base, query, k, fuzzy):
    ws, wi = base.search(query, k, fuzzy=fuzzy)
    # oracle fetched one deeper: the k-th slot's competitor is rank k+1
    es_full, ei_full = base.exact_topk(query, k + 1, fuzzy=fuzzy)
    es, ei = es_full[:k], ei_full[:k]
    np.testing.assert_allclose(ws, es, rtol=1e-4, atol=1e-4, err_msg=query)
    # ids must agree wherever the score is unique (ties / float32-rounding
    # near-ties may reorder)
    for j in range(k):
        if wi[j] < 0:
            assert ei[j] < 0, (query, j)
            continue
        gap_ok = (j == 0 or es_full[j - 1] - es_full[j] > 1e-4) and (
            es_full[j] - es_full[j + 1] > 1e-4
        )
        if gap_ok:
            assert wi[j] == ei[j], (query, j, ws, wi, es, ei)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wand_matches_exact(seed):
    rng = np.random.default_rng(seed)
    base = WandBaseline(_corpus(rng, int(rng.integers(50, 2000))))
    for query in [
        "quick brown fox",
        "databsae",          # typo: fuzzy-only match
        "quick quick dog",   # repeated token
        "zzzz absent",       # no postings at all
        "fox",
        "quick brown fox lazy dog search database index vector",
    ]:
        for k in (1, 5, 20):
            for fuzzy in (False, True):
                _check(base, query, k, fuzzy)


def test_wand_prunes_but_stays_exact_on_skew():
    """A very skewed corpus (one rare high-scoring term + floods of a common
    term) is where WAND's pruning actually skips blocks — results must still
    be exact."""
    rng = np.random.default_rng(7)
    texts = ["common " * int(rng.integers(1, 20)) for _ in range(5000)]
    for i in rng.choice(5000, size=25, replace=False):
        texts[int(i)] = "rare gem " + texts[int(i)]
    base = WandBaseline(texts)
    _check(base, "rare common", 10, fuzzy=False)
    _check(base, "gem", 30, fuzzy=False)


def test_wand_empty_and_bounds():
    base = WandBaseline(["quick fox", "lazy dog"])
    s, i = base.search("", 5)
    assert (i == -1).all() and (s == 0).all()
    with pytest.raises(ValueError):
        import nucliadb_tpu_native as native

        native.bm25_wand_search(
            base.offsets, base.docs, base.tfs, base.dl_norm, base.maxtf,
            np.array([999], np.int64), np.array([1.0], np.float32), 5, 1.2,
        )
