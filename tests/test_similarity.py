"""Pluggable similarity (similarity.lisp:101-131, query.lisp:53-54):
the scoring fn is swappable per index config or per Searcher, the classic
tf-idf built-in matches the reference's default-similarity formulas, a
user-registered subclass flows end-to-end, and WAND pruning stays
rank-exact for any similarity honoring the tf_norm monotonicity contract."""

import math
from dataclasses import dataclass

import numpy as np
import pytest
from pyspark.sql import functions as F

from montezuma_spark.fixtures import search_docs_df
from montezuma_spark.index import FieldConfig, Index, IndexConfig, build_index
from montezuma_spark.search import (
    SHOULD,
    ClassicSimilarity,
    Searcher,
    Similarity,
    TermQuery,
    bool_query,
    register_similarity,
)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = search_docs_df(spark)
    cfg = IndexConfig(
        fields=[FieldConfig("field", "field", "whitespace")],
        key_col="url", shard_bits=2, similarity="classic",
    )
    return build_index(spark, docs, cfg)


def test_classic_matches_reference_formulas(spark, corpus):
    """score = Σ_t (1+ln(n/(df+1))) · sqrt(tf) / sqrt(dl) — the
    default-similarity tf/idf/length-norm of similarity.lisp:155-166."""
    got = dict(Searcher(corpus).top_docs(TermQuery("field", "word2"), k=None))
    texts = [r["field"] for r in
             search_docs_df(spark).orderBy("url").collect()]
    n = len(texts)
    df = sum(1 for t in texts if "word2" in t.split())
    idf = 1.0 + math.log(n / (df + 1.0))
    want = {
        d: idf * math.sqrt(t.split().count("word2")) / math.sqrt(len(t.split()))
        for d, t in enumerate(texts)
        if "word2" in t.split()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_similarity_survives_save_load(spark, corpus, tmp_path):
    d = str(tmp_path / "six")
    loaded = Index.load(spark, corpus.save(d).index_dir or d)
    assert loaded.config.similarity == "classic"
    q = TermQuery("field", "word3")
    assert Searcher(loaded).top_docs(q, k=5) == Searcher(corpus).top_docs(q, k=5)


def test_searcher_level_override(spark, corpus):
    """The same index answers under a different similarity without a
    rebuild — the query-level hook."""
    q = TermQuery("field", "word2")
    classic = Searcher(corpus).top_docs(q, k=None)
    bm25 = Searcher(corpus, similarity="bm25").top_docs(q, k=None)
    assert {d for d, _ in classic} == {d for d, _ in bm25}
    assert [s for _, s in classic] != [s for _, s in bm25]


@dataclass(frozen=True)
class _ConstTf(Similarity):
    """Toy custom similarity: pure idf weighting (tf_norm ≡ 1 — trivially
    monotone, so WAND-safe)."""

    name: str = "const-tf"

    def idf(self, df, n):
        return 1.0 + math.log(n / (df + 1.0))

    def tf_norm(self, tfs, dls, avgdl):
        return np.ones(len(np.asarray(tfs)), dtype=np.float64)


def test_registered_custom_similarity(spark, corpus):
    register_similarity("const-tf", _ConstTf)
    got = dict(
        Searcher(corpus, similarity="const-tf").top_docs(
            TermQuery("field", "word2"), k=None
        )
    )
    n = 18
    idf = 1.0 + math.log(n / (3 + 1.0))
    assert set(got) == {1, 4, 8}
    for d in got:
        assert got[d] == pytest.approx(idf, rel=1e-12)


def test_classic_wand_rank_identical(spark):
    """Block-max pruning under classic scoring: pruned top-k must equal
    the exhaustive ranking (tf_norm = sqrt(tf)/sqrt(dl) honors the
    monotone contract, so tf_norm(maxtf, mindl) bounds each block)."""
    import pandas as pd

    rng = np.random.RandomState(3)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [
        {
            "url": f"c://{i:05d}",
            "text": " ".join(rng.choice(words, size=rng.randint(2, 60))),
        }
        for i in range(300)
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    cfg = IndexConfig(
        fields=[FieldConfig("text", "text", "whitespace")], key_col="url",
        shard_bits=5, block_size=16, similarity="classic",
    )
    idx = build_index(spark, docs, cfg)
    q = bool_query(*[(TermQuery("text", w), SHOULD) for w in words[:4]])
    full = Searcher(idx).top_docs(q, k=None)
    got = Searcher(idx).top_docs(q, k=10)
    # a tiny vocab produces EXACT score ties whose order can flip with
    # last-ulp summation differences between the pruned and exhaustive
    # paths — compare rankings after rounding scores to 9 decimals
    def norm(items):
        return sorted(
            ((round(s, 9), d) for d, s in items),
            key=lambda x: (-x[0], x[1]),
        )

    assert norm(got) == norm(full[:10])
    want = dict(full)
    for d, s in got:
        assert s == pytest.approx(want[d], rel=1e-12)


def test_similarity_instance_direct(spark, corpus):
    """Passing a Similarity INSTANCE (not a registry name) works too."""
    q = TermQuery("field", "word2")
    by_name = Searcher(corpus, similarity="classic").top_docs(q, k=3)
    by_obj = Searcher(corpus, similarity=ClassicSimilarity()).top_docs(q, k=3)
    assert by_name == by_obj
