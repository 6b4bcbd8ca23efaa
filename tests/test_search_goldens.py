"""End-to-end golden query tests on the 18-doc corpus.

Doc-id-set goldens come verbatim from the reference
(tests/unit/search/tc-index-searcher.lisp, via FIXTURES.md §1); BM25 rank
goldens come from the single-process oracle (montezuma_spark/oracle.py),
which the Spark engine must match rank-identically with scores equal to
1e-9 relative.
"""

import numpy as np
import pytest

from montezuma_spark.fixtures import SEARCH_DOCS, search_docs_df, simple_docs_df
from montezuma_spark.index import FieldConfig, IndexConfig, build_index
from montezuma_spark.oracle import OracleIndex
from montezuma_spark.search import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    MatchAllQuery,
    PhraseQuery,
    RangeQuery,
    Searcher,
    TermQuery,
    WildcardQuery,
    bool_query,
)

CFG = IndexConfig(
    fields=[
        FieldConfig("field", "field", "whitespace"),
        FieldConfig("date", "date", None, positions=False),
        FieldConfig("cat", "cat", None, positions=False),
    ],
    shard_bits=3,
    block_size=4,
)


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(build_index(spark, search_docs_df(spark), CFG))


@pytest.fixture(scope="module")
def oracle():
    o = OracleIndex()
    for i, (date, field, cat) in enumerate(SEARCH_DOCS):
        o.add(
            i,
            {
                "field": (field, "whitespace"),
                "date": (date, None),
                "cat": (cat, None),
            },
        )
    return o


def T(t, **kw):
    return TermQuery("field", t, **kw)


# --- doc-id-set goldens (tc-index-searcher.lisp) ---------------------------

GOLDEN_SETS = [
    (T("word2"), [1, 4, 8], "term field:word2 :67-69"),
    (T("2342"), [], "absent term :70"),
    (T("word1"), list(range(18)), "term field:word1 :72-77"),
    (
        bool_query((T("word1"), MUST), (T("word3"), MUST)),
        [2, 3, 6, 8, 11, 14],
        "bool +word1 +word3 :105-107",
    ),
    (
        bool_query((T("word1"), MUST), (T("word3"), MUST), (T("word2"), SHOULD)),
        [2, 3, 6, 8, 11, 14],
        "bool +word1 +word3 word2 :108-111",
    ),
    (
        bool_query((T("word3"), MUST), (T("word2"), MUST_NOT)),
        [2, 3, 6, 11, 14],
        "bool +word3 !word2 :112-115",
    ),
    (
        bool_query((T("word3"), MUST_NOT)),
        [],
        "pure negation :116-118",
    ),
    (
        bool_query((T("word2"), SHOULD), (T("word3"), SHOULD)),
        [1, 2, 3, 4, 6, 8, 11, 14],
        "bool word2 word3 OR :119-122",
    ),
    (
        bool_query((T("word1"), MUST), (T("word2"), SHOULD), (T("word3"), SHOULD)),
        list(range(18)),
        "bool +word1 word2 word3 :123-127",
    ),
    (PhraseQuery.of("field", ["quick"]), [1, 11, 14, 16, 17], "phrase quick :149-155"),
    (PhraseQuery.of("field", ["quick", "brown"]), [1], "phrase quick brown :156-157"),
    (
        PhraseQuery.of("field", ["quick", "brown", "fox"]),
        [1],
        "phrase quick brown fox :158-159",
    ),
    (
        PhraseQuery("field", ("quick", "fox"), (0, 2)),
        [1, 11, 14],
        "phrase quick <gap> fox :160-163",
    ),
    (
        PhraseQuery("field", ("quick", "fox"), (0, 2), slop=1),
        [1, 11, 14, 16],
        "slop 1 :164-165",
    ),
    (
        PhraseQuery("field", ("quick", "fox"), (0, 2), slop=4),
        [1, 11, 14, 16, 17],
        "slop 4 :166-167",
    ),
    (
        bool_query(
            (T("word1"), SHOULD),
            (PhraseQuery.of("field", ["brown", "fox"]), MUST_NOT),
        ),
        [0, 2, 3, 4, 5, 6, 7, 9, 10, 11, 12, 13, 14, 15, 16],
        "word1 !\"brown fox\" :176-187",
    ),
    (
        RangeQuery("date", "20051006", "20051010", True, True),
        [6, 7, 8, 9, 10],
        "range incl/incl :188-195",
    ),
    (
        RangeQuery("date", "20051006", "20051010", False, True),
        [7, 8, 9, 10],
        "range excl/incl :196-202",
    ),
    (
        RangeQuery("date", "20051006", "20051010", True, False),
        [6, 7, 8, 9],
        "range incl/excl :203-209",
    ),
    (
        RangeQuery("date", "20051006", "20051010", False, False),
        [7, 8, 9],
        "range excl/excl :210-216",
    ),
    (
        RangeQuery("date", None, "20051003", True, True),
        [0, 1, 2, 3],
        "range <=20051003 :217-222",
    ),
    (
        RangeQuery("date", None, "20051003", True, False),
        [0, 1, 2],
        "range <20051003 :223-228",
    ),
    (
        WildcardQuery("cat", "cat1*"),
        [0, 1, 2, 3, 4, 13, 14, 15, 16, 17],
        "wildcard cat1* :229-233",
    ),
    (
        WildcardQuery("cat", "cat1*/su??ub2"),
        [4, 16],
        "wildcard cat1*/su??ub2 :234-237",
    ),
    (MatchAllQuery(), list(range(18)), "match-all"),
]


@pytest.mark.parametrize(
    "query,expected,label", GOLDEN_SETS, ids=[g[2] for g in GOLDEN_SETS]
)
def test_golden_doc_sets(searcher, oracle, query, expected, label):
    assert searcher.matching_docids(query) == expected, label
    assert oracle.matching(query) == expected, f"oracle disagrees: {label}"


# --- BM25 rank-identity vs oracle ------------------------------------------

RANK_QUERIES = [
    T("word3"),
    bool_query((T("word1"), MUST), (T("word3"), MUST), (T("word2"), SHOULD)),
    bool_query((T("word2"), SHOULD), (T("word3"), SHOULD), (T("fox"), SHOULD)),
    PhraseQuery.of("field", ["quick", "brown"]),
    PhraseQuery("field", ("quick", "fox"), (0, 2), slop=4),
    RangeQuery("date", "20051003", "20051012", True, False),
    WildcardQuery("cat", "cat1*"),
    bool_query(
        (T("word1"), MUST),
        (PhraseQuery.of("field", ["brown", "fox"]), MUST_NOT),
        (T("word3", boost=2.0), SHOULD),
    ),
]


@pytest.mark.parametrize("query", RANK_QUERIES, ids=[str(i) for i in range(len(RANK_QUERIES))])
def test_bm25_rank_identity(searcher, oracle, query):
    got = searcher.top_docs(query, k=10)
    want = oracle.top_k(query, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d1, s1), (d2, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, rel=1e-9), (d1, d2)


def test_topk_pagination_shape(searcher):
    # k smaller than match count
    top3 = searcher.top_docs(T("word1"), k=3)
    top10 = searcher.top_docs(T("word1"), k=10)
    assert len(top3) == 3 and len(top10) == 10
    assert top3 == top10[:3]
    # first-doc offset (index-searcher.lisp:56-108 first-doc/num-docs)
    page2 = searcher.top_docs(T("word1"), k=3, first_doc=3)
    assert page2 == top10[3:6]
    # distributed path honors the same offset
    rows = searcher.search(T("word1"), k=3, first_doc=3).collect()
    assert [r["docid"] for r in rows] == [d for d, _ in page2]


def test_simple_corpus_goldens(spark):
    # tc-index.lisp:29-60 via FIXTURES §4
    cfg = IndexConfig(
        fields=[FieldConfig("text", "text", "default")], shard_bits=3,
        block_size=4,
    )
    s = Searcher(build_index(spark, simple_docs_df(spark), cfg))

    def TT(t):
        return TermQuery("text", t)

    assert s.matching_docids(TT("one")) == [0, 1, 3, 4, 6]
    assert s.matching_docids(bool_query((TT("one"), MUST), (TT("two"), MUST))) == [0, 4]
    assert s.matching_docids(
        bool_query((TT("two"), MUST), (TT("three"), MUST), (TT("four"), MUST))
    ) == [5, 7]
    assert s.matching_docids(
        bool_query((TT("one"), SHOULD), (TT("five"), SHOULD))
    ) == [0, 1, 3, 4, 6, 7]
