"""Predict engines: query embedding + answer generation seams.

Parity with the reference's Predict API client
(nucliadb/src/nucliadb/search/predict.py:343,513 — /query embeddings,
/chat generation against the external Nuclia Predict service):

- ``HTTPPredictEngine`` speaks the same role over HTTP to any service
  exposing /embed and /generate.
- ``LocalPredictEngine`` runs an in-process encoder callable (e.g. a
  flax/transformers model the deployment loads itself) — the embedded
  deployment's replacement for the external dependency.
- ``HashingEncoder`` is a deterministic, dependency-free fallback (feature
  hashing of token n-grams): functional for tests/dev, not semantically
  meaningful — real deployments plug a model.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

import httpx
import numpy as np

from ..index.text_engine.tokenizer import tokenize


class HashingEncoder:
    """Feature-hashing bag-of-ngrams embedding (deterministic, no ML)."""

    def __init__(self, dimension: int = 256):
        self.dimension = dimension

    def __call__(self, text: str) -> np.ndarray:
        v = np.zeros(self.dimension, np.float32)
        tokens = tokenize(text)
        grams = tokens + [" ".join(p) for p in zip(tokens, tokens[1:])]
        for g in grams:
            h = hashlib.blake2b(g.encode(), digest_size=8).digest()
            idx = int.from_bytes(h[:4], "little") % self.dimension
            sign = 1.0 if h[4] & 1 else -1.0
            v[idx] += sign
        n = np.linalg.norm(v)
        return v / n if n else v


class LocalPredictEngine:
    """In-process embeddings (+ optional generation callable)."""

    def __init__(
        self,
        encoder: Optional[Callable[[str], np.ndarray]] = None,
        generator: Optional[Callable[[str, list[str]], str]] = None,
    ):
        self.encoder = encoder or HashingEncoder()
        self.generator = generator

    def embed(self, kbid: str, vectorset: str, text: str) -> Optional[np.ndarray]:
        return np.asarray(self.encoder(text), np.float32)

    def generate(self, kbid: str, prompt: str, context: list[str]) -> str:
        if self.generator is None:
            joined = "\n\n".join(context[:3])
            return f"[no generative model configured]\n{joined}"
        return self.generator(prompt, context)


class HTTPPredictEngine:
    """Remote predict service (the reference's Predict API role)."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.client = httpx.Client(base_url=base_url, timeout=timeout)

    def embed(self, kbid: str, vectorset: str, text: str) -> Optional[np.ndarray]:
        resp = self.client.post(
            "/embed", json={"kbid": kbid, "vectorset": vectorset, "text": text}
        )
        resp.raise_for_status()
        return np.asarray(resp.json()["vector"], np.float32)

    def generate(self, kbid: str, prompt: str, context: list[str]) -> str:
        resp = self.client.post(
            "/generate", json={"kbid": kbid, "prompt": prompt, "context": context}
        )
        resp.raise_for_status()
        return resp.json()["answer"]
