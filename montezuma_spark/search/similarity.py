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


# ---------------------------------------------------------------------------
# SmallFloat byte315 norm quantization (opt-in reference-score fidelity)
# ---------------------------------------------------------------------------
# The reference encodes boost×1/sqrt(dl) into ONE byte via Lucene's
# SmallFloat 3-mantissa-bit/5-exponent-bit scheme (similarity.lisp:40-60:
# float-to-byte315 / byte315-to-float, zero-point 63-15) and scores with
# the decoded table value (*norm-table*, similarity.lisp:90-99). The
# default engine keeps exact dl (SURVEY §1.1 design choice); this block
# reproduces the byte table exactly for the opt-in quantized similarity.

_B315_ZERO = (63 - 15) << 3  # 384: smallfloat value of the zero point


def float_to_byte315(f: float) -> int:
    """Lucene SmallFloat.floatToByte315 (similarity.lisp:50-60). NOTE:
    the Lisp port's underflow branch `(if (<= bits) 0 1)` is a
    one-argument `<=` (always true → always 0); we follow the Lucene
    original it claims to mirror (tiny positive floats → byte 1), which
    the reference's own round-trip test cannot distinguish."""
    bits = int(np.float32(f).view(np.int32))
    smallfloat = bits >> 21
    if smallfloat <= _B315_ZERO:
        return 0 if bits <= 0 else 1
    if smallfloat >= _B315_ZERO + 0x100:
        return 255
    return smallfloat - _B315_ZERO


def byte315_to_float(b: int) -> float:
    """Lucene SmallFloat.byte315ToFloat (similarity.lisp:39-45)."""
    if b == 0:
        return 0.0
    bits = ((b & 0xFF) << 21) + ((63 - 15) << 24)
    return float(np.int32(bits).view(np.float32))


# *norm-table* (similarity.lisp:90-93): all 256 decoded norm values
NORM_TABLE = np.array([byte315_to_float(i) for i in range(256)],
                      dtype=np.float64)


def float_to_byte315_np(arr: np.ndarray) -> np.ndarray:
    """Vectorized floatToByte315 for posting-array norms."""
    bits = np.ascontiguousarray(arr, dtype=np.float32).view(np.int32)
    small = (bits >> 21).astype(np.int64)
    out = small - _B315_ZERO
    out = np.where(small <= _B315_ZERO, np.where(bits <= 0, 0, 1), out)
    return np.where(small >= _B315_ZERO + 0x100, 255, out)


@dataclass(frozen=True)
class ClassicQuantizedSimilarity(ClassicSimilarity):
    """Classic similarity with the reference's byte315-quantized length
    norm: 1/sqrt(dl) round-trips through the SmallFloat byte before
    multiplying (write-norms → decode-norm, similarity.lisp:95-99), so
    scores match a live Montezuma/Lucene-style index byte-for-byte on
    the length-norm axis. Deviation kept: the reference multiplies
    doc boost INTO the byte (one composite norm); here boost rides the
    index's own 1/1024 quantization and multiplies outside — identical
    when boost == 1 (the common case), documented otherwise.

    WAND-safe: encode∘decode is monotone non-decreasing, so tf_norm
    keeps the monotone ↑tf / ↓dl contract the block bounds require."""

    name: str = "classic-quantized"

    def tf_norm(self, tfs, dls, avgdl):
        tf = np.asarray(tfs, dtype=np.float64)
        dl = np.asarray(dls, dtype=np.float64)
        raw = 1.0 / np.sqrt(np.maximum(dl, 1.0))
        norm = NORM_TABLE[float_to_byte315_np(raw)]
        return np.sqrt(tf) * norm


SIMILARITIES: dict[str, type] = {
    "bm25": BM25Similarity,
    "classic": ClassicSimilarity,
    "classic-quantized": ClassicQuantizedSimilarity,
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
