"""Padded-size bucket ladder shared by every consolidated arena.

Sizes come from {2^k, 1.5*2^k}: ~2 jit variants per octave while capping
padding waste at 33% (a pure power-of-two ladder wastes up to 2x — at
1M x 768 f32 that is 3.2 GB of HBM; for the text engine it inflates every
dense stopword row and mask transfer the same way).
"""

from __future__ import annotations


def bucket(n: int, minimum: int = 128) -> int:
    size = minimum
    while size < n:
        if size + size // 2 >= n:
            return size + size // 2
        size *= 2
    return size
