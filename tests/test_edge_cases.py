"""Edge-case hardening: degenerate corpora and queries must degrade
gracefully (empty results, never exceptions) — the robustness envelope a
100-TB pipeline hits constantly (empty partitions, blank fields, non-ASCII
bytes, queries over unknown fields)."""

import pandas as pd
import pytest

from montezuma_spark.index import FieldConfig, IndexConfig, build_index
from montezuma_spark.search import (
    MatchAllQuery,
    PhraseQuery,
    RangeQuery,
    Searcher,
    TermQuery,
    WildcardQuery,
)


def _cfg(**kw):
    return IndexConfig(
        fields=[FieldConfig("text", "text", "standard")], key_col="url",
        shard_bits=3, **kw,
    )


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], "url string, text string")
    idx = build_index(spark, docs, _cfg())
    assert idx.stats == {}
    s = Searcher(idx)
    assert s.top_docs(TermQuery("text", "anything"), k=5) == []
    assert s.matching_docids(MatchAllQuery()) == []
    assert s.count(WildcardQuery("text", "a*")) == 0


def test_blank_and_nonascii_docs(spark):
    texts = [
        "",                       # zero tokens
        "   \t\n  ",              # whitespace only
        "caf\u00e9 \u65e5\u672c\u8a9e \U0001f600 plain",  # non-ASCII + one
        None,                     # null text
        "normal words here",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"url": [f"u://{i}" for i in range(5)], "text": texts})
    )
    idx = build_index(spark, docs, _cfg())
    s = Searcher(idx)
    # every doc (incl. empty/null) exists: dl+1 marker trick keeps dl=0 docs
    assert s.matching_docids(MatchAllQuery()) == [0, 1, 2, 3, 4]
    lens = {
        r["docid"]: r["dl"]
        for r in idx.doc_lens.filter("field = 'text'").collect()
    }
    assert lens[0] == 0 and lens[1] == 0 and lens[3] == 0
    # ASCII tokens of the mixed doc are indexed (standard tokenizer is
    # ASCII-semantics like the reference's cl-ppcre \w)
    assert s.matching_docids(TermQuery("text", "plain")) == [2]
    assert s.matching_docids(TermQuery("text", "caf")) == [2]


def test_degenerate_queries(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"url": ["a", "b"], "text": ["one two", "two three"]})
    )
    idx = build_index(spark, docs, _cfg())
    s = Searcher(idx)
    # unknown field
    assert s.top_docs(TermQuery("nofield", "one"), k=5) == []
    # inverted range
    assert s.matching_docids(RangeQuery("text", "z", "a", True, True)) == []
    # exclusive empty range
    assert s.matching_docids(RangeQuery("text", "two", "two", False, False)) == []
    # phrase with an absent term
    assert s.matching_docids(PhraseQuery.of("text", ["one", "zzz"])) == []
    # wildcard matching nothing
    assert s.matching_docids(WildcardQuery("text", "qqq*")) == []
    # empty-string term (parser's empty-analysis fallback)
    assert s.top_docs(TermQuery("text", ""), k=5) == []
    # k=0
    assert s.top_docs(TermQuery("text", "two"), k=0) == []
    # pagination beyond the result set
    assert s.top_docs(TermQuery("text", "two"), k=5, first_doc=10) == []


def test_duplicate_keys_keep_first(spark):
    """Duplicate url keys: exactly one docid, first row kept (the rank-of-
    key assignment contract)."""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["dup", "dup", "other"],
                "text": ["alpha beta", "IGNORED words", "alpha"],
            }
        )
    )
    idx = build_index(spark, docs, _cfg())
    s = Searcher(idx)
    assert idx.doc_map.count() == 2
    assert s.matching_docids(TermQuery("text", "ignored")) == []
    assert s.matching_docids(TermQuery("text", "alpha")) == [0, 1]
