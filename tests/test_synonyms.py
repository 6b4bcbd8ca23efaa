"""Query-time synonym expansion (search/synonyms.py): tree rewrite to
SHOULD disjunctions / MultiPhraseQuery alternative slots."""

import pytest

from montezuma_spark.fixtures import search_docs_df
from montezuma_spark.index import FieldConfig, IndexConfig, build_index
from montezuma_spark.search import (
    MUST,
    MultiPhraseQuery,
    PhraseQuery,
    Searcher,
    TermQuery,
    bool_query,
)
from montezuma_spark.search.synonyms import expand_synonyms, symmetric_closure

CFG = IndexConfig(
    fields=[FieldConfig("field", "field", "whitespace")],
    key_col="url", shard_bits=3, block_size=4,
)

SYN = {"word2": ("word3",), "quick": ("fast",)}


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(build_index(spark, search_docs_df(spark), CFG))


def test_symmetric_closure():
    m = symmetric_closure([("a", "b", "c"), ("x", "y")])
    assert m == {
        "a": ("b", "c"), "b": ("a", "c"), "c": ("a", "b"),
        "x": ("y",), "y": ("x",),
    }


def test_term_expands_to_disjunction(searcher):
    q = expand_synonyms(TermQuery("field", "word2"), SYN)
    got = searcher.top_docs(q, k=None)
    want = searcher.top_docs(
        bool_query(
            (TermQuery("field", "word2"), "SHOULD"),
            (TermQuery("field", "word3"), "SHOULD"),
        ),
        k=None,
    )
    assert got == want and len(got) > 0


def test_no_synonym_is_identity(searcher):
    q = TermQuery("field", "word1")
    assert expand_synonyms(q, SYN) is q
    p = PhraseQuery.of("field", ["word1", "fox"])
    assert expand_synonyms(p, SYN) is p


def test_phrase_slot_becomes_multi_phrase(searcher):
    # "quick brown" with quick~fast must also match "fast brown" (doc 8)
    q = expand_synonyms(PhraseQuery.of("field", ["quick", "brown"]), SYN)
    assert isinstance(q, MultiPhraseQuery)
    got = searcher.top_docs(q, k=None)
    want = searcher.top_docs(
        MultiPhraseQuery.of("field", [("quick", "fast"), "brown"]), k=None
    )
    assert got == want
    plain = {d for d, _ in searcher.top_docs(
        PhraseQuery.of("field", ["quick", "brown"]), k=None)}
    assert 8 in {d for d, _ in got} and 8 not in plain


def test_fields_restriction(searcher):
    q = TermQuery("field", "word2")
    assert expand_synonyms(q, SYN, fields={"other"}) is q


def test_constant_score_recursion(searcher):
    from montezuma_spark.search import ConstantScoreQuery

    q = expand_synonyms(
        ConstantScoreQuery(TermQuery("field", "word2"), 2.0), SYN
    )
    assert isinstance(q, ConstantScoreQuery) and q.boost == 2.0
    got = searcher.top_docs(q, k=None)
    want = searcher.top_docs(
        ConstantScoreQuery(
            bool_query(
                (TermQuery("field", "word2"), "SHOULD"),
                (TermQuery("field", "word3"), "SHOULD"),
            ),
            2.0,
        ),
        k=None,
    )
    assert got == want and len(got) > 0
    # untouched wrapper is identity
    cs = ConstantScoreQuery(TermQuery("field", "word1"), 1.5)
    assert expand_synonyms(cs, SYN) is cs


def test_boolean_recursion(searcher):
    q = expand_synonyms(
        bool_query(
            (TermQuery("field", "word2"), MUST),
            (TermQuery("field", "fox"), MUST),
        ),
        SYN,
    )
    got = searcher.top_docs(q, k=None)
    want = searcher.top_docs(
        bool_query(
            (bool_query(
                (TermQuery("field", "word2"), "SHOULD"),
                (TermQuery("field", "word3"), "SHOULD"),
            ), MUST),
            (TermQuery("field", "fox"), MUST),
        ),
        k=None,
    )
    assert got == want
