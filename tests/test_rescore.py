"""DocIdSetQuery (bounded filter leaf) and Searcher.rescore
(second-pass re-ranking of a bounded top-window)."""

import pytest

from montezuma_spark.fixtures import search_docs_df
from montezuma_spark.index import FieldConfig, IndexConfig, build_index
from montezuma_spark.oracle import OracleIndex
from montezuma_spark.search import (
    MUST,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    DocIdSetQuery,
    PhraseQuery,
    Searcher,
    TermQuery,
    bool_query,
)
from montezuma_spark.search.ast import FILTER

CFG = IndexConfig(
    fields=[FieldConfig("field", "field", "whitespace")],
    key_col="url", shard_bits=3, block_size=4,
)


@pytest.fixture(scope="module")
def corpus(spark):
    idx = build_index(spark, search_docs_df(spark), CFG)
    o = OracleIndex()
    for i, r in enumerate(search_docs_df(spark).orderBy("url").collect()):
        o.add(i, {"field": (r["field"], "whitespace")})
    return idx, o


def test_docidset_filter_restricts(corpus):
    idx, _ = corpus
    s = Searcher(idx)
    allow = (1, 4, 9)
    q = BooleanQuery(
        (
            BooleanClause(TermQuery("field", "word1"), MUST),
            BooleanClause(DocIdSetQuery(allow), FILTER),
        )
    )
    got = s.top_docs(q, k=None)
    plain = dict(s.top_docs(TermQuery("field", "word1"), k=None))
    assert {d for d, _ in got} == set(allow)
    for d, sc in got:
        assert sc == pytest.approx(plain[d])  # FILTER is scoreless


def test_docidset_standalone_both_tiers(corpus):
    idx, _ = corpus
    q = DocIdSetQuery((3, 7, 11), boost=1.5)
    a = Searcher(idx).top_docs(q, k=None)
    b = Searcher(idx, distributed=True).top_docs(q, k=None)
    assert a == b == [(3, 1.5), (7, 1.5), (11, 1.5)]


def test_docidset_out_of_range_ids_never_match(corpus):
    """Ids outside [0, max_doc) name no document — the zero-term root
    path has no postings intersection to drop them, so the kernel must
    clamp (hypothesis-found: DocIdSetQuery((max_doc,)) returned a hit)."""
    idx, _ = corpus
    n = idx.num_docs()
    q = DocIdSetQuery((-3, 0, n - 1, n, n + 7), boost=2.0)
    for s in (Searcher(idx), Searcher(idx, distributed=True)):
        assert s.top_docs(q, k=None) == [(0, 2.0), (n - 1, 2.0)]


def test_docidset_rejected_as_should_or_must(corpus):
    idx, _ = corpus
    s = Searcher(idx)
    for occur in (SHOULD, MUST):
        q = BooleanQuery(
            (
                BooleanClause(TermQuery("field", "word1"), SHOULD),
                BooleanClause(DocIdSetQuery((1, 2)), occur),
            )
        )
        with pytest.raises(ValueError):
            s.top_docs(q, k=3)


def test_rescore_matches_bruteforce(corpus):
    idx, o = corpus
    s = Searcher(idx)
    primary = TermQuery("field", "word1")
    secondary = PhraseQuery.of("field", ["quick", "brown"])
    got = s.rescore(primary, secondary, window=8, weight=2.0, k=5)
    page = s.top_docs(primary, k=8)
    sec = o.scores(secondary)
    want = sorted(
        ((d, sc + 2.0 * sec.get(d, 0.0)) for d, sc in page),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(d, pytest.approx(sc)) for d, sc in want] == got
    # the phrase doc must outrank equal-primary peers after rescore
    phrase_docs = set(o.eval(secondary))
    if phrase_docs & {d for d, _ in page}:
        assert got[0][0] in phrase_docs


def test_rescore_window_bounds_secondary(corpus):
    idx, _ = corpus
    s = Searcher(idx)
    # window=1: only the single top hit can gain the secondary score
    got = s.rescore(
        TermQuery("field", "word1"), TermQuery("field", "word2"),
        window=1, weight=10.0, k=3,
    )
    assert len(got) == 1  # rescore never returns beyond the window


def test_docidset_in_search_batch_matches_single(corpus):
    idx, _ = corpus
    s = Searcher(idx)
    qs = {
        "set": DocIdSetQuery((2, 5, 9), boost=1.5),
        "term": TermQuery("field", "word2"),
    }
    out = s.search_batch(qs, k=5)
    rows = {}
    for r in out.collect():
        rows.setdefault(r["qid"], []).append(
            (int(r["docid"]), float(r["score"]))
        )
    for qid, q in qs.items():
        want = [
            (int(r["docid"]), float(r["score"]))
            for r in s.search(q, k=5).collect()
        ]
        assert rows.get(qid, []) == want, qid


def test_docidset_filter_with_only_must_not_sibling_raises(corpus):
    # MUST_NOT does not shard-restrict the set; the compile check must
    # reject it even at the root
    idx, _ = corpus
    s = Searcher(idx)
    q = BooleanQuery(
        (
            BooleanClause(TermQuery("field", "word1"), "MUST_NOT"),
            BooleanClause(DocIdSetQuery((1, 2, 3)), FILTER),
        )
    )
    with pytest.raises(ValueError):
        s.top_docs(q, k=3)


def test_rescore_secondary_unperturbed_under_classic(corpus):
    # the DocIdSet FILTER wrapper must not change the secondary's
    # classic query_norm: combined - primary == weight * secondary
    idx, _ = corpus
    s = Searcher(idx, similarity="classic")
    primary = TermQuery("field", "word1")
    secondary = TermQuery("field", "word2")
    got = dict(s.rescore(primary, secondary, window=18, weight=3.0, k=18))
    prim = dict(s.top_docs(primary, k=18))
    sec = dict(s.top_docs(secondary, k=None))
    for d, comb in got.items():
        assert comb == pytest.approx(
            prim[d] + 3.0 * sec.get(d, 0.0)
        ), d
