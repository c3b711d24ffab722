"""Fuzzy term expansion via deletion neighborhoods (SymSpell scheme).

The reference matches query terms fuzzily with Levenshtein distance 1
(nidx_paragraph/src/fuzzy_query.rs, nidx_relation FUZZY_DISTANCE=1) using
tantivy's Levenshtein automata over its FST term dictionary. Without an FST,
the equivalent constant-time scheme is the deletion neighborhood: two terms
are within edit distance 1 iff they share a member of each other's
{self} ∪ {single-char deletions} sets. We precompute the deletion variants
of every vocabulary term once at consolidation; a query term then expands
with pure dict lookups (verified with a real edit-distance check to kill
false positives like transposition-adjacent collisions).
"""

from __future__ import annotations


def _deletes(term: str) -> set[str]:
    return {term[:i] + term[i + 1 :] for i in range(len(term))}


def levenshtein_leq(a: str, b: str, d: int) -> bool:
    """Banded edit-distance check: distance(a, b) <= d."""
    if abs(len(a) - len(b)) > d:
        return False
    if a == b:
        return True
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i] + [0] * len(b)
        lo = max(1, i - d)
        hi = min(len(b), i + d)
        if lo > 1:
            cur[lo - 1] = d + 1
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if hi < len(b):
            cur[hi + 1 :] = [d + 1] * (len(b) - hi)
        if min(cur[max(0, lo - 1) : hi + 1]) > d:
            return False
        prev = cur
    return prev[len(b)] <= d


class FuzzyIndex:
    """Deletion-neighborhood index over a vocabulary (distance 1 native;
    distance 2 by chaining)."""

    def __init__(self, terms: list[str]):
        self.terms = terms
        self.variant_map: dict[str, list[int]] = {}
        for idx, term in enumerate(terms):
            for variant in _deletes(term) | {term}:
                self.variant_map.setdefault(variant, []).append(idx)

    def expand(self, token: str, distance: int = 1) -> list[str]:
        """Vocabulary terms within edit distance of the token."""
        if distance <= 0:
            return [token] if token in self.variant_map else []
        probes = _deletes(token) | {token}
        if distance >= 2:
            probes |= {v for p in list(probes) for v in _deletes(p)}
        cand_ids: set[int] = set()
        for probe in probes:
            cand_ids.update(self.variant_map.get(probe, ()))
        out = []
        for idx in cand_ids:
            term = self.terms[idx]
            if levenshtein_leq(token, term, distance):
                out.append(term)
        return sorted(out)


def fuzzy_expand(token: str, fuzzy_index: "FuzzyIndex", distance: int = 1) -> list[str]:
    return fuzzy_index.expand(token, distance)
