"""Classic-similarity reference pipeline: coord + query-norm
(round-2 verdict missing item #1).

Golden values from the reference's own unit tests
(tests/unit/search/tc-similarity.lisp:23-38): tf(9)=3.0, idf(9,10)=1.0,
length-norm(16)=0.25, query-norm(16)=0.25, coord(12,3)=4.0. Pipeline
semantics from query.lisp:9-15 (weight = ssw → query-norm → normalize),
term-query.lisp:29-36 (value = idf²·boost·norm), boolean-query.lisp:12-13
(coord DISABLED by default), boolean-scorer.lisp:52-54,262-266
(max-coord = scoring clauses, score ×= coord(matchers, max-coord))."""

import math

import numpy as np
import pytest

from montezuma_spark.fixtures import search_docs_df
from montezuma_spark.index import FieldConfig, IndexConfig, build_index
from montezuma_spark.search import (
    MUST,
    MUST_NOT,
    SHOULD,
    ClassicSimilarity,
    Searcher,
    TermQuery,
    bool_query,
)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = search_docs_df(spark)
    cfg = IndexConfig(
        fields=[FieldConfig("field", "field", "whitespace")],
        key_col="url", shard_bits=2, similarity="classic",
    )
    return build_index(spark, docs, cfg)


def test_reference_unit_goldens():
    sim = ClassicSimilarity()
    # tf(9)=3.0 and length-norm(16)=1/4 → tf_norm = 3/4
    assert sim.tf_norm(np.array([9]), np.array([16]), 1.0)[0] == \
        pytest.approx(0.75, rel=1e-12)
    # idf(9, 10) = 1 + ln(10/(9+1)) = 1.0
    assert sim.idf(9, 10) == pytest.approx(1.0, rel=1e-12)
    # coord(12, 3) = 4.0 (default-coord-function = overlap/max-overlap)
    assert sim.coord(12, 3) == pytest.approx(4.0, rel=1e-12)
    # query-norm(16) = 1/sqrt(16) = 0.25 — exercised through the searcher
    # pipeline below; the formula itself:
    assert 1.0 / math.sqrt(16) == 0.25


def _expected_classic(texts, terms, boosts=None):
    """Reference pipeline by hand: per-term weight w=idf·boost,
    norm=1/sqrt(Σw²), contribution = idf²·boost·norm·sqrt(tf)/sqrt(dl)."""
    n = len(texts)
    boosts = boosts or {t: 1.0 for t in terms}
    idf = {
        t: 1.0 + math.log(n / (sum(1 for x in texts if t in x.split()) + 1.0))
        for t in terms
    }
    ssw = sum((idf[t] * boosts[t]) ** 2 for t in terms)
    norm = 1.0 / math.sqrt(ssw)
    out = {}
    for d, text in enumerate(texts):
        toks = text.split()
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf:
                s += (idf[t] ** 2) * boosts[t] * norm * math.sqrt(tf) \
                    / math.sqrt(len(toks))
        if s:
            out[d] = s
    return out


def test_classic_bool_matches_reference_pipeline(spark, corpus):
    texts = [r["field"] for r in search_docs_df(spark).orderBy("url").collect()]
    q = bool_query(
        (TermQuery("field", "word2"), SHOULD),
        (TermQuery("field", "word3"), SHOULD),
    )
    got = dict(Searcher(corpus).top_docs(q, k=None))
    want = _expected_classic(texts, ["word2", "word3"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), d


def test_classic_single_term_pipeline_invisible(spark, corpus):
    """Single-term: ssw=(idf)², norm=1/idf → idf²·norm = idf — identical
    to the pre-pipeline scores (why ft_classic_topk's oracle is stable)."""
    texts = [r["field"] for r in search_docs_df(spark).orderBy("url").collect()]
    got = dict(Searcher(corpus).top_docs(TermQuery("field", "word2"), k=None))
    n = len(texts)
    df = sum(1 for t in texts if "word2" in t.split())
    idf = 1.0 + math.log(n / (df + 1.0))
    for d, s in got.items():
        toks = texts[d].split()
        assert s == pytest.approx(
            idf * math.sqrt(toks.count("word2")) / math.sqrt(len(toks)),
            rel=1e-12,
        )


def test_coord_enabled_scales_by_overlap(spark, corpus):
    """coord ON: docs matching 1 of 2 SHOULD clauses score ×1/2 relative
    to the coord-disabled run; docs matching both score ×1."""
    qs = [
        (TermQuery("field", "word2"), SHOULD),
        (TermQuery("field", "word3"), SHOULD),
    ]
    off = dict(Searcher(corpus).top_docs(bool_query(*qs), k=None))
    on = dict(
        Searcher(corpus).top_docs(
            bool_query(*qs, coord_disabled=False), k=None
        )
    )
    texts = [r["field"] for r in search_docs_df(spark).orderBy("url").collect()]
    assert set(on) == set(off)
    for d in on:
        toks = set(texts[d].split())
        overlap = ("word2" in toks) + ("word3" in toks)
        assert on[d] == pytest.approx(off[d] * overlap / 2.0, rel=1e-12), d


def test_coord_max_excludes_prohibited_and_counts_must(spark, corpus):
    """MUST + SHOULD + MUST_NOT with coord ON: max_coord = 2 (MUST and
    SHOULD; never the prohibited clause, boolean-scorer.lisp:52-54)."""
    q = bool_query(
        (TermQuery("field", "word1"), MUST),
        (TermQuery("field", "word2"), SHOULD),
        (TermQuery("field", "fox"), MUST_NOT),
        coord_disabled=False,
    )
    off = dict(
        Searcher(corpus).top_docs(
            bool_query(
                (TermQuery("field", "word1"), MUST),
                (TermQuery("field", "word2"), SHOULD),
                (TermQuery("field", "fox"), MUST_NOT),
            ),
            k=None,
        )
    )
    on = dict(Searcher(corpus).top_docs(q, k=None))
    texts = [r["field"] for r in search_docs_df(spark).orderBy("url").collect()]
    assert set(on) == set(off)
    for d in on:
        toks = set(texts[d].split())
        overlap = ("word1" in toks) + ("word2" in toks)
        assert on[d] == pytest.approx(off[d] * overlap / 2.0, rel=1e-12), d


def test_coord_under_bm25_opt_in(spark):
    """coord is similarity-agnostic in the reference (a coordinator over
    any similarity); under bm25 it stays opt-in and scales the same way."""
    docs = search_docs_df(spark)
    cfg = IndexConfig(
        fields=[FieldConfig("field", "field", "whitespace")],
        key_col="url", shard_bits=2,
    )
    idx = build_index(spark, docs, cfg)
    qs = [
        (TermQuery("field", "word2"), SHOULD),
        (TermQuery("field", "word3"), SHOULD),
    ]
    off = dict(Searcher(idx).top_docs(bool_query(*qs), k=None))
    on = dict(
        Searcher(idx).top_docs(bool_query(*qs, coord_disabled=False), k=None)
    )
    texts = [r["field"] for r in docs.orderBy("url").collect()]
    for d in on:
        toks = set(texts[d].split())
        overlap = ("word2" in toks) + ("word3" in toks)
        assert on[d] == pytest.approx(off[d] * overlap / 2.0, rel=1e-12), d


def test_classic_boost_in_query_norm(spark, corpus):
    """Boosted clause: w_t = idf_t·boost_t enters ssw; contribution
    carries boost once (term-query.lisp:29-36)."""
    texts = [r["field"] for r in search_docs_df(spark).orderBy("url").collect()]
    q = bool_query(
        (TermQuery("field", "word2", boost=2.0), SHOULD),
        (TermQuery("field", "word3"), SHOULD),
    )
    got = dict(Searcher(corpus).top_docs(q, k=None))
    want = _expected_classic(
        texts, ["word2", "word3"], boosts={"word2": 2.0, "word3": 1.0}
    )
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12), d
