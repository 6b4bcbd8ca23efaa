"""Query-parser parse-tree goldens from tc-query-parser.lisp:95-183."""

import pytest

from montezuma_spark.search import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    PhraseQuery,
    TermQuery,
    WildcardQuery,
)
from montezuma_spark.search.parser import QueryParser


def P(**kw):
    return QueryParser(fields=("f1", "f2"), **kw)


def clause(q, occur=SHOULD):
    return BooleanClause(q, occur)


def bq(*clauses):
    return BooleanQuery(tuple(clauses))


def T(field, term, boost=1.0):
    return TermQuery(field, term, boost)


CASES = [
    ("abc", bq(clause(T("*", "abc")))),
    ("abc def", bq(clause(T("*", "abc")), clause(T("*", "def")))),
    ("john's", bq(clause(T("*", "john")))),
    (
        "john's email is jjwiseman@yahoo.com mail-to",
        bq(
            clause(T("*", "john")),
            clause(T("*", "email")),
            clause(T("*", "is")),
            clause(T("*", "jjwiseman@yahoo.com")),
            clause(PhraseQuery("*", ("mail", "to"), (0, 1))),
        ),
    ),
    ("+abc", bq(clause(T("*", "abc"), MUST))),
    (
        "abc +def ghi",
        bq(
            clause(T("*", "abc")),
            clause(T("*", "def"), MUST),
            clause(T("*", "ghi")),
        ),
    ),
    ("foo*", bq(clause(WildcardQuery("*", "foo*")))),
    ("foo?bar", bq(clause(WildcardQuery("*", "foo?bar")))),
    ("*foo*", bq(clause(WildcardQuery("*", "*foo*")))),
    ("*foo", bq(clause(WildcardQuery("*", "*foo")))),
    ("*foo*bar", bq(clause(WildcardQuery("*", "*foo*bar")))),
    ("+*foo", bq(clause(WildcardQuery("*", "*foo"), MUST))),
    ("!abc", bq(clause(T("*", "abc"), MUST_NOT))),
    ("abc !def", bq(clause(T("*", "abc")), clause(T("*", "def"), MUST_NOT))),
    ('"abc"', bq(clause(T("*", "abc")))),
    ('"abc def"', bq(clause(PhraseQuery("*", ("abc", "def"), (0, 1))))),
    (
        'abc "def hij"',
        bq(clause(T("*", "abc")), clause(PhraseQuery("*", ("def", "hij"), (0, 1)))),
    ),
    (
        'foo* "bad dog"',
        bq(
            clause(WildcardQuery("*", "foo*")),
            clause(PhraseQuery("*", ("bad", "dog"), (0, 1))),
        ),
    ),
    ("field:value", bq(clause(T("field", "value")))),
    ("field:foo*", bq(clause(WildcardQuery("field", "foo*")))),
    ("field:*foo", bq(clause(WildcardQuery("field", "*foo")))),
    ("+field:abc", bq(clause(T("field", "abc"), MUST))),
    (
        'field:"1 2 3"',
        bq(clause(PhraseQuery("field", ("1", "2", "3"), (0, 1, 2)))),
    ),
    (
        '!"ha ha" !"ha ha" !"ha ha" "ha ha"',
        bq(
            clause(PhraseQuery("*", ("ha", "ha"), (0, 1)), MUST_NOT),
            clause(PhraseQuery("*", ("ha", "ha"), (0, 1)), MUST_NOT),
            clause(PhraseQuery("*", ("ha", "ha"), (0, 1)), MUST_NOT),
            clause(PhraseQuery("*", ("ha", "ha"), (0, 1))),
        ),
    ),
    # bad-parse fallback (leading/trailing whitespace)
    (
        "  blah:blah  ",
        bq(clause(T("*", "blah")), clause(T("*", "blah"))),
    ),
]


@pytest.mark.parametrize("s,expected", CASES, ids=[c[0] for c in CASES])
def test_parse_tree_goldens(s, expected):
    # The reference parse-tree goldens assume the stop-LESS standard
    # analyzer ("is"/"to" survive) — the stale-analyzer caveat of
    # SURVEY.md §2.2 — so goldens are checked with standard-nostop.
    # Parsed with NO fields to compare raw (pre-multi-field) trees.
    got = QueryParser(fields=(), analyzer="standard-nostop").parse(s)
    assert got == expected, f"{s!r}\n got: {got}\nwant: {expected}"


def test_multi_field_expansion():
    q = P().parse("abc")
    inner = q.clauses[0].query
    assert isinstance(inner, BooleanQuery)
    assert [c.query for c in inner.clauses] == [T("f1", "abc"), T("f2", "abc")]
    assert all(c.occur == SHOULD for c in inner.clauses)


def test_boost_parsing():
    q = QueryParser(fields=()).parse("abc^4")
    assert q.clauses[0].query == T("*", "abc", boost=4.0)
    # non-integer boost → bad parse fallback
    q2 = QueryParser(fields=()).parse("abc^x")
    assert isinstance(q2.clauses[0].query if isinstance(q2, BooleanQuery) else q2,
                      (TermQuery, BooleanQuery))


def test_empty_word_analysis_yields_empty_term():
    # standard analyzer strips "the" (stop word) → empty term query
    q = QueryParser(fields=()).parse("the")
    assert q.clauses[0].query == T("*", "")


def test_field_applies_to_next_query_only():
    q = QueryParser(fields=()).parse("field:abc def")
    assert q.clauses[0].query == T("field", "abc")
    assert q.clauses[1].query == T("*", "def")


def test_parser_extensions_fuzzy_and_slop():
    """Opt-in ~ syntax (extensions=True): word~/word~0.7 → FuzzyQuery,
    "a b"~2 → phrase slop; composes with field:, boost and occur. The
    DEFAULT grammar stays a faithful reference port: ~ is an ordinary
    word character there."""
    from montezuma_spark.search import FuzzyQuery, PhraseQuery, TermQuery
    from montezuma_spark.search.ast import MUST
    from montezuma_spark.search.parser import QueryParser

    from montezuma_spark.search.ast import rewrite

    p = QueryParser(default_field="text", analyzer="simple", extensions=True)
    q = rewrite(p.parse("spark~"))
    assert q == FuzzyQuery("text", "spark", 0.5)
    q = rewrite(p.parse("spark~0.7"))
    assert q == FuzzyQuery("text", "spark", 0.7)
    q = rewrite(p.parse('"batch batch"~2'))
    assert isinstance(q, PhraseQuery) and q.slop == 2
    q = p.parse("+title:spark~0.8^3")
    c = q.clauses[0] if hasattr(q, "clauses") else None
    if c is None:
        got = q
    else:
        got = c.query
    assert got == FuzzyQuery("title", "spark", 0.8, boost=3.0)
    if c is not None:
        assert c.occur == MUST
    # bad fuzziness falls back to the OR-of-tokens bad-parse (reference
    # error-recovery behavior)
    q = rewrite(p.parse("spark~7"))
    assert q == TermQuery("text", "spark")
    # default grammar unchanged: ~ is a word char, analyzer strips it
    p0 = QueryParser(default_field="text", analyzer="simple")
    assert rewrite(p0.parse("spark~0.7")) == TermQuery("text", "spark")
    assert rewrite(p0.parse('"batch batch"~2')) != rewrite(
        p.parse('"batch batch"~2')
    )
