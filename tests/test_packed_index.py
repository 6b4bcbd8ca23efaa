"""End-to-end equivalence of the packed (PForDelta-class) block codec:
an index built with block_codec="packed" must answer every query shape
identically to the varint index over the same corpus — same docids, same
scores — through build, save/load, the distributed kernel, WAND pruning,
boosts, expunge, and term-vector uninversion; and its postings bytes must
actually be smaller."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from montezuma_spark.fixtures import synth_web_pages_df
from montezuma_spark.index import FieldConfig, Index, IndexConfig, build_index
from montezuma_spark.search import (
    MUST,
    MUST_NOT,
    SHOULD,
    PhraseQuery,
    RangeQuery,
    Searcher,
    TermQuery,
    WildcardQuery,
    bool_query,
)

N = 400


def _cfg(codec, **kw):
    return IndexConfig(
        fields=[FieldConfig("text", "text", "simple")], key_col="url",
        shard_bits=5, block_size=16, block_codec=codec, **kw,
    )


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    docs = synth_web_pages_df(spark, N).withColumn(
        "boost", (F.substring(F.col("url"), -1, 1).cast("int") % 3 + 1) / 2.0
    )
    root = tmp_path_factory.mktemp("codecpair")
    var = build_index(spark, docs, _cfg("varint", boost_col="boost"),
                      index_dir=str(root / "var"))
    pak = build_index(spark, docs, _cfg("packed", boost_col="boost"),
                      index_dir=str(root / "pak"))
    return Index.load(spark, str(root / "var")), Index.load(
        spark, str(root / "pak")
    )


QUERIES = [
    TermQuery("text", "spark"),
    bool_query((TermQuery("text", "spark"), MUST),
               (TermQuery("text", "merge"), MUST)),
    bool_query((TermQuery("text", "spark"), SHOULD),
               (TermQuery("text", "vector"), SHOULD),
               (TermQuery("text", "window"), SHOULD)),
    bool_query((TermQuery("text", "merge"), MUST),
               (TermQuery("text", "spark"), MUST_NOT)),
    PhraseQuery.of("text", ["spark", "merge"], slop=2),
    PhraseQuery.of("text", ["batch", "batch"]),
    RangeQuery("text", "key", "merge", True, True),
    WildcardQuery("text", "s*"),
]


def test_packed_answers_identical(spark, pair):
    var, pak = pair
    sv, sp = Searcher(var), Searcher(pak)
    for q in QUERIES:
        assert sv.top_docs(q, k=20) == sp.top_docs(q, k=20), q
        assert sv.matching_docids(q) == sp.matching_docids(q), q
    # distributed kernel path too
    dv = Searcher(var, distributed=True).top_docs(QUERIES[2], k=10)
    dp = Searcher(pak, distributed=True).top_docs(QUERIES[2], k=10)
    assert dv == dp


def test_packed_cells_smaller(spark, pair):
    var, pak = pair
    bv = var.postings.agg(F.sum(F.length("postings"))).collect()[0][0]
    bp = pak.postings.agg(F.sum(F.length("postings"))).collect()[0][0]
    assert bp < bv, (bp, bv)


def test_packed_expunge_and_term_vectors(spark, pair):
    var, pak = pair
    # expunge re-encodes touched cells in the index's own codec
    pak.delete_docs(list(range(0, N, 7)))
    var.delete_docs(list(range(0, N, 7)))
    ev, ep = var.expunge_deletes(), pak.expunge_deletes()
    q = TermQuery("text", "merge")
    assert Searcher(ev).top_docs(q, k=15) == Searcher(ep).top_docs(q, k=15)
    # uninversion decodes with the right codec
    tv_v = ev.term_vectors(docids=[1]).orderBy("term").collect()
    tv_p = ep.term_vectors(docids=[1]).orderBy("term").collect()
    assert [(r["term"], r["tf"], list(r["positions"])) for r in tv_v] == [
        (r["term"], r["tf"], list(r["positions"])) for r in tv_p
    ]


def test_packed_config_roundtrip(spark, pair):
    _, pak = pair
    assert pak.config.block_codec == "packed"
