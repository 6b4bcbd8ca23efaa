"""Cursor deep paging (Searcher.search_after): page-concatenation
equals the full ranking, ties page correctly, tiers agree."""

import pytest

from montezuma_spark.fixtures import search_docs_df, simple_docs_df
from montezuma_spark.index import FieldConfig, IndexConfig, build_index
from montezuma_spark.search import Searcher, TermQuery

CFG = IndexConfig(
    fields=[FieldConfig("field", "field", "whitespace")],
    key_col="url", shard_bits=3, block_size=4,
)

SIMPLE_CFG = IndexConfig(
    fields=[FieldConfig("text", "text", "whitespace")],
    key_col="url", shard_bits=3, block_size=4,
)


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(build_index(spark, search_docs_df(spark), CFG))


@pytest.fixture(scope="module")
def dist_searcher(spark):
    return Searcher(
        build_index(spark, search_docs_df(spark), CFG), distributed=True
    )


def _rows(df):
    return [(int(r["docid"]), float(r["score"])) for r in df.collect()]


def _paged(s, q, page):
    """Concatenate pages from search() + repeated search_after()."""
    out = _rows(s.search(q, k=page))
    while True:
        if len(out) < page or not out:
            break
        nxt = _rows(s.search_after(q, out[-1], k=page))
        if not nxt:
            break
        out.extend(nxt)
    return out


def test_pages_reassemble_full_ranking(searcher):
    q = TermQuery("field", "word1")
    full = searcher.top_docs(q, k=None)
    assert len(full) > 6
    for page in (1, 3, 5):
        assert _paged(searcher, q, page) == full


def test_cursor_pages_through_score_ties(spark):
    # SIMPLE_DOCS has duplicate texts -> identical scores; the cursor's
    # (score == s AND docid > d) arm must page through the tie group
    s = Searcher(build_index(spark, simple_docs_df(spark), SIMPLE_CFG))
    q = TermQuery("text", "one")
    full = s.top_docs(q, k=None)
    scores = [sc for _, sc in full]
    assert len(scores) != len(set(scores)), "fixture must contain ties"
    assert _paged(s, q, 2) == full


def test_tiers_agree_and_cursor_transfers(searcher, dist_searcher):
    q = TermQuery("field", "word1")
    page1 = _rows(searcher.search(q, k=4))
    a = _rows(searcher.search_after(q, page1[-1], k=4))
    b = _rows(dist_searcher.search_after(q, page1[-1], k=4))
    assert a == b
    # cursor from the local tier pages the distributed tier identically
    full = searcher.top_docs(q, k=None)
    assert a == full[4:8]


def test_after_last_hit_is_empty(searcher):
    q = TermQuery("field", "word1")
    full = searcher.top_docs(q, k=None)
    assert _rows(searcher.search_after(q, full[-1], k=5)) == []


def test_matches_offset_paging(searcher):
    q = TermQuery("field", "word1")
    page1 = _rows(searcher.search(q, k=3))
    via_offset = _rows(searcher.search(q, k=3, first_doc=3))
    via_cursor = _rows(searcher.search_after(q, page1[-1], k=3))
    assert via_cursor == via_offset


def test_keys_false_matches_keyed_page(searcher):
    q = TermQuery("field", "word1")
    page1 = _rows(searcher.search(q, k=3))
    with_keys = _rows(searcher.search_after(q, page1[-1], k=3))
    without = _rows(searcher.search_after(q, page1[-1], k=3, keys=False))
    assert with_keys == without
    cols = searcher.search_after(q, page1[-1], k=3, keys=False).columns
    assert cols == ["docid", "score"]
