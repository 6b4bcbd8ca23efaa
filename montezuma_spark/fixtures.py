"""Reference test corpora, re-expressed as deterministic DataFrames.

Sources (see FIXTURES.md):
* 18-doc search corpus — tests/unit/index/th-doc.lisp:242-271 (primary
  golden-query fixture; whitespace-analyzer per
  tests/unit/search/tc-index-searcher.lisp:40)
* simple array corpus — tests/unit/index/tc-index.lisp:17-26
* synthetic web_pages generator matching BASELINE.json input_hint
  (url, warc_ts, html, text, lang) — seeded, no external data.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

# docid → (date, field, cat), verbatim from th-doc.lisp:242-271
SEARCH_DOCS = [
    ("20050930", "word1", "cat1/"),
    ("20051001", "word1 word2 the quick brown fox", "cat1/sub1"),
    ("20051002", "word1 word3", "cat1/sub1/subsub1"),
    ("20051003", "word1 word3", "cat1/sub2"),
    ("20051004", "word1 word2", "cat1/sub2/subsub2"),
    ("20051005", "word1", "cat2/sub1"),
    ("20051006", "word1 word3", "cat2/sub1"),
    ("20051007", "word1", "cat2/sub1"),
    ("20051008", "word1 word2 word3 the fast brown fox", "cat2/sub1"),
    ("20051009", "word1", "cat3/sub1"),
    ("20051010", "word1", "cat3/sub1"),
    ("20051011", "word1 word3 the quick red fox", "cat3/sub1"),
    ("20051012", "word1", "cat3/sub1"),
    ("20051013", "word1", "cat1/sub2"),
    ("20051014", "word1 word3 the quick hairy fox", "cat1/sub1"),
    ("20051015", "word1", "cat1/sub2/subsub1"),
    ("20051016", "word1 the quick fox is brown and hairy and a little red",
     "cat1/sub1/subsub2"),
    ("20051017", "word1 the brown fox is quick and red", "cat1/"),
]

# tc-index.lisp:17-26 — "|" separates multiple values of the default field;
# the reference concatenates them with a position-increment gap of 0, which
# for whitespace analysis equals joining with a space.
SIMPLE_DOCS = [
    "one two", "one|three", "two", "one|four", "one two",
    "two|three|four", "one", "two|three|four|five",
]


def search_docs_pdf() -> pd.DataFrame:
    rows = []
    for i, (date, field, cat) in enumerate(SEARCH_DOCS):
        rows.append(
            {
                "url": f"test://search-docs/{i:04d}",
                "docid_expected": i,
                "date": date,
                "field": field,
                "cat": cat,
            }
        )
    return pd.DataFrame(rows)


def search_docs_df(spark):
    return spark.createDataFrame(search_docs_pdf())


def simple_docs_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": [f"test://simple/{i:04d}" for i in range(len(SIMPLE_DOCS))],
            "docid_expected": list(range(len(SIMPLE_DOCS))),
            "text": [s.replace("|", " ") for s in SIMPLE_DOCS],
        }
    )


def simple_docs_df(spark):
    return spark.createDataFrame(simple_docs_pdf())


# ---------------------------------------------------------------------------
# synthetic web_pages (BASELINE.json input_hint schema), deterministic
# ---------------------------------------------------------------------------

_WORDS = (
    "spark index term query search merge sort shuffle partition broadcast "
    "filter join scan parquet arrow vector batch stream window document "
    "token corpus engine score rank posting block delta varint shard"
).split()


def synth_web_pages_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Seeded Common-Crawl-style web_pages table (url, warc_ts, html, text, lang)."""
    rng = np.random.RandomState(seed)
    lengths = rng.randint(5, 120, size=n_docs)
    texts = [
        " ".join(rng.choice(_WORDS, size=ln)) for ln in lengths
    ]
    base = _dt.datetime(2026, 1, 1)
    return pd.DataFrame(
        {
            "url": [f"http://example.com/{i:08d}" for i in range(n_docs)],
            "warc_ts": [base + _dt.timedelta(seconds=int(i)) for i in range(n_docs)],
            "html": [f"<html><body>{t}</body></html>".encode() for t in texts],
            "text": texts,
            "lang": [["en", "de", "fr", "es", "zh"][i % 5] for i in range(n_docs)],
        }
    )


def synth_web_pages_df(spark, n_docs: int, seed: int = 42):
    return spark.createDataFrame(synth_web_pages_pdf(n_docs, seed))


_SYNTH_VOCAB_SIZE = 10_000


def synth_corpus_spark(spark, n_docs: int, avg_len: int = 80,
                       vocab_size: int = _SYNTH_VOCAB_SIZE,
                       parts: int | None = None,
                       dup_every: int | None = None):
    """Distributed deterministic synthetic corpus (url, text, lang).

    Content is a pure function of the row id (arithmetic hashing, Zipf-ish
    term skew) — identical regardless of partitioning/parallelism, so the
    same corpus feeds both arms of the scaling benchmark without shipping
    data from the driver.

    ``dup_every``: when set (≥2), every id with ``id % dup_every ==
    dup_every - 1`` carries the TEXT of ``id - 1`` with its first token
    replaced — a deterministic near-duplicate (one-token edit), giving the
    corpus ~n/dup_every true near-dup pairs for dedup scale benchmarks.

    Round-4 note: the token hash gained a nonlinear avalanche (see the
    comment at the draw site), so content differs from the rounds-1-3
    corpus; the statistical profile (length distribution, Zipf skew,
    vocabulary) is unchanged, keeping build-throughput comparisons valid.
    """
    import pandas as pd

    parts = parts or spark.sparkContext.defaultParallelism * 2

    def gen(batches):
        # letters-only words (digits don't survive letter tokenizers)
        letters = "abcdefghijklmnopqrstuvwxyz"

        def b26(i: int) -> str:
            s = ""
            for _ in range(4):
                s += letters[i % 26]
                i //= 26
            return s

        vocab = np.array(
            ["w" + b26(i) for i in range(vocab_size)], dtype=object
        )
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            if dup_every:
                dmask = (ids % dup_every) == (dup_every - 1)
                src = np.where(dmask, ids - 1, ids)
            else:
                dmask = None
                src = ids
            lens = 20 + ((src * 2654435761) % (2 * avg_len - 40 + 1))
            bounds = np.cumsum(lens)
            total = int(bounds[-1]) if len(bounds) else 0
            row_of = np.repeat(np.arange(len(ids)), lens)
            j = np.arange(total, dtype=np.int64) - np.repeat(
                bounds - lens, lens
            )
            x = src[row_of] * 1315423911 + j * 2654435761 + 97
            # nonlinear avalanche (xorshift-multiply): a PURELY LINEAR
            # congruential draw aliases — token streams of docs i and
            # i+d align whenever d·c1·c2⁻¹ mod 2³¹ is smaller than a
            # doc length, which manufactured an O(n²)-growing family of
            # genuine shared-run near-dups (~52-shingle runs, J 0.3-0.7;
            # found by the round-4 dedup scale arm as a candidate growth
            # exponent of 1.4 that no banding depth could remove)
            x &= 0x7FFFFFFFFFFFFFFF
            x ^= x >> 21
            x = (x * 2685821657736338717) & 0x7FFFFFFFFFFFFFFF
            x ^= x >> 35
            h = x & 0x7FFFFFFF
            # Zipf-ish skew: square the uniform draw
            u = (h % 1_000_000) / 1_000_000.0
            tok_idx = (u * u * vocab_size).astype(np.int64)
            toks = vocab[tok_idx]
            if dmask is not None:
                # the near-dup edit: first token swapped for an
                # out-of-vocab marker (one-token edit distance)
                toks[dmask[row_of] & (j == 0)] = "wnearduped"
            texts = [
                " ".join(toks[bounds[i] - lens[i] : bounds[i]])
                for i in range(len(ids))
            ]
            yield pd.DataFrame(
                {
                    "url": [f"synth://doc/{i:012d}" for i in ids],
                    "text": texts,
                    "lang": ["en"] * len(ids),
                }
            )

    return (
        spark.range(0, n_docs, 1, parts)
        .mapInPandas(gen, schema="url string, text string, lang string")
    )


def synth_embeddings_spark(spark, n_vecs: int, dim: int = 64,
                           n_clusters: int = 256, noise: float = 0.35,
                           parts: int | None = None):
    """Distributed deterministic clustered embeddings
    (vec_id long, embedding array<float>) — unit-norm vectors drawn as
    ``center[id % n_clusters] + noise·hash_noise(id)``, all arithmetic
    hashing: a pure function of vec_id, identical at any parallelism.
    The cluster structure makes IVF recall/probe benchmarks meaningful
    (uniform random vectors have no neighbors to find)."""
    import pandas as pd

    parts = parts or spark.sparkContext.defaultParallelism * 2
    d_idx = np.arange(dim, dtype=np.int64)

    def hmat(keys: np.ndarray) -> np.ndarray:
        """(n,) int64 keys → (n, dim) floats in [-1, 1), hash-derived."""
        h = (
            keys[:, None] * 2654435761 + d_idx[None, :] * 97003 + 12345
        ) & 0x7FFFFFFF
        return (h % 2000003) / 1000001.5 - 1.0

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            centers = hmat((ids % n_clusters) * 1000003 + 7)
            centers /= np.maximum(
                np.linalg.norm(centers, axis=1, keepdims=True), 1e-12
            )
            v = centers + noise * hmat(ids * 31337 + 11)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(v.astype(np.float32))}
            )

    return spark.range(0, n_vecs, 1, parts).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )


def documents_as_web_pages(spark, sf_dir: str):
    """Adapt the driver's documents.parquet to the web_pages shape.

    url is zero-padded so lexicographic url order == doc_id order, making
    docid assignment (rank by url) equal doc_id — which keeps the DuckDB
    oracle SQL simple (ROW_NUMBER over url ordering).
    """
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.format_string("doc://%010d", F.col("doc_id")).alias("url"),
            F.col("text"),
            F.col("lang"),
            F.col("source"),
            F.col("doc_id"),
        )
    )
