"""Pluggable scoring functions (the similarity registry).

Reference parity: ``similarity`` is a generic-function protocol the user
can subclass and attach per query/index (src/search/similarity.lisp:
101-131, query.lisp:53-54). Here a ``Similarity`` is two vectorized
functions over posting arrays:

* ``idf(df, n)``                — per-term weight from corpus stats
* ``tf_norm(tfs, dls, avgdl)``  — per-posting weight from tf / doc length

score contribution of term t in doc d =
    idf(t) · query_boost · doc_boost(d) · tf_norm(tf, dl, avgdl)

CONTRACT for block-max WAND correctness: ``tf_norm`` must be monotone
non-decreasing in tf and non-increasing in dl — then
``tf_norm(maxtf, mindl, avgdl)`` is a valid per-block upper bound and
pruned top-k stays rank-exact (the same requirement Lucene places on
impacts). Both built-ins satisfy it; custom similarities registered via
``register_similarity`` must too (or disable pruning by querying with
k=None).

Built-ins:
* ``bm25``    — the north-star default (k1/b from IndexConfig)
* ``classic`` — the reference's default-similarity tf-idf
  (similarity.lisp:155-166: tf=sqrt(freq), idf=1+ln(n/(df+1)),
  length-norm=1/sqrt(dl))

This module is numpy-only (no pyspark): it ships inside the serialized
query plan to every shard kernel.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from montezuma_spark.codec.postings import BM25_B, BM25_K1


@dataclass(frozen=True)
class Similarity:
    """Base protocol; subclass and override idf / tf_norm."""

    name: str = "base"

    # Reference weight pipeline (query.lisp:9-15): when True, the searcher
    # computes query_norm = 1/sqrt(Σ (idf·boost)² over scoring leaves) at
    # compile time, and the kernel scores each term with idf² (the
    # term-weight value = query_weight·idf chain, term-query.lisp:29-36).
    # A query-global scalar → ranking-safe under WAND pruning.
    normalize_query: bool = False

    def idf(self, df: int, n: int) -> float:
        raise NotImplementedError

    def tf_norm(self, tfs: np.ndarray, dls: np.ndarray,
                avgdl: float) -> np.ndarray:
        raise NotImplementedError

    def coord(self, overlap: int, max_overlap: int) -> float:
        """Clause-overlap factor for coord-enabled boolean queries —
        the reference's default-coord-function (similarity.lisp:167-169:
        overlap / max-overlap)."""
        return overlap / max_overlap if max_overlap else 1.0


@dataclass(frozen=True)
class BM25Similarity(Similarity):
    name: str = "bm25"
    k1: float = BM25_K1
    b: float = BM25_B

    def idf(self, df: int, n: int) -> float:
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def tf_norm(self, tfs, dls, avgdl):
        tf = np.asarray(tfs, dtype=np.float64)
        dl = np.asarray(dls, dtype=np.float64)
        return (
            tf
            * (self.k1 + 1.0)
            / (tf + self.k1 * (1.0 - self.b + self.b * dl / max(avgdl, 1e-9)))
        )


@dataclass(frozen=True)
class ClassicSimilarity(Similarity):
    """The reference's default-similarity (similarity.lisp:155-166):
    sqrt-tf with 1/sqrt(dl) length norm (avgdl unused). Scores through
    the full reference weight pipeline: per-term idf²·boost scaled by
    query_norm = 1/sqrt(Σ squared weights) (query.lisp:9-15,
    similarity.lisp:149-153) — a single-term query reduces to
    idf·sqrt(tf)/sqrt(dl), so the pipeline is invisible there."""

    name: str = "classic"
    normalize_query: bool = True

    def idf(self, df: int, n: int) -> float:
        if n == 0:
            return 0.0
        return 1.0 + math.log(n / (df + 1.0))

    def tf_norm(self, tfs, dls, avgdl):
        tf = np.asarray(tfs, dtype=np.float64)
        dl = np.asarray(dls, dtype=np.float64)
        return np.sqrt(tf) / np.sqrt(np.maximum(dl, 1.0))


SIMILARITIES: dict[str, type] = {
    "bm25": BM25Similarity,
    "classic": ClassicSimilarity,
}


def register_similarity(name: str, cls: type) -> None:
    """Register a user Similarity subclass (the subclassing hook of
    similarity.lisp:101-131; mirrors the analyzer registry)."""
    SIMILARITIES[name] = cls


def get_similarity(name_or_obj, k1: float = BM25_K1,
                   b: float = BM25_B) -> Similarity:
    if isinstance(name_or_obj, Similarity):
        return name_or_obj
    cls = SIMILARITIES[name_or_obj]
    if cls is BM25Similarity:
        return BM25Similarity(k1=k1, b=b)
    return cls()
