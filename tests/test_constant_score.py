"""ConstantScoreQuery — every matching doc scores exactly boost
(rewritten to MatchAll ∧ FILTER; rides existing kernels unchanged)."""

import pytest

from montezuma_spark.fixtures import search_docs_df
from montezuma_spark.index import FieldConfig, IndexConfig, build_index
from montezuma_spark.oracle import OracleIndex
from montezuma_spark.search import (
    SHOULD,
    ConstantScoreQuery,
    RangeQuery,
    Searcher,
    TermQuery,
    bool_query,
    rewrite,
)

CFG = IndexConfig(
    fields=[
        FieldConfig("field", "field", "whitespace"),
        FieldConfig("date", "date", None, positions=False),
    ],
    key_col="url", shard_bits=3, block_size=4,
)


@pytest.fixture(scope="module")
def corpus(spark):
    idx = build_index(spark, search_docs_df(spark), CFG)
    o = OracleIndex()
    for i, r in enumerate(search_docs_df(spark).orderBy("url").collect()):
        o.add(i, {"field": (r["field"], "whitespace"),
                  "date": (r["date"], None)})
    return idx, o


def test_matches_wrapped_query_with_constant_score(corpus):
    idx, _ = corpus
    s = Searcher(idx)
    inner = TermQuery("field", "word2")
    got = s.top_docs(ConstantScoreQuery(inner, boost=2.5), k=None)
    assert sorted(d for d, _ in got) == s.matching_docids(inner)
    assert all(sc == pytest.approx(2.5) for _, sc in got)
    # equal scores -> served in docid order
    assert [d for d, _ in got] == sorted(d for d, _ in got)


def test_constant_score_over_range_filter(corpus):
    idx, _ = corpus
    s = Searcher(idx)
    q = ConstantScoreQuery(RangeQuery("date", "20051006", "20051010"))
    got = s.top_docs(q, k=None)
    assert [(d, pytest.approx(1.0)) for d in [6, 7, 8, 9, 10]] == got


def test_composes_as_should_clause(corpus):
    idx, o = corpus
    s = Searcher(idx)
    q = bool_query(
        (TermQuery("field", "word3"), SHOULD),
        (ConstantScoreQuery(TermQuery("field", "fox"), 0.5), SHOULD),
    )
    got = s.top_docs(q, k=None)
    want = o.top_k(q, k=len(got) + 5)
    assert [(d, pytest.approx(sc)) for d, sc in want] == got


def test_tiers_agree(corpus):
    idx, _ = corpus
    q = ConstantScoreQuery(TermQuery("field", "word2"), 3.0)
    dist = Searcher(idx, distributed=True).top_docs(q, k=None)
    dflt = Searcher(idx).top_docs(q, k=None)
    assert dist == dflt and len(dist) > 0


def test_native_node_survives_rewrite_and_stays_local(corpus):
    # the node evaluates natively (no MatchAll formulation): rewrite
    # keeps it, and the driver-local fast path stays eligible — a
    # MatchAll tree would force the distributed doc_lens cogroup
    r = rewrite(ConstantScoreQuery(TermQuery("f", "t"), 2.0))
    assert isinstance(r, ConstantScoreQuery)
    assert r.query == TermQuery("f", "t") and r.boost == 2.0
    idx, _ = corpus
    s = Searcher(idx)
    q = ConstantScoreQuery(TermQuery("field", "word2"), 2.0)
    assert s._execute_local(q, None) is not None


def test_explain_matches_served_score(corpus):
    idx, _ = corpus
    s = Searcher(idx)
    q = ConstantScoreQuery(TermQuery("field", "word2"), 2.0)
    d, sc = s.top_docs(q, k=1)[0]
    tree = s.explain(q, d)
    assert tree["value"] == pytest.approx(sc)
    assert tree["type"] == "constant_score"
