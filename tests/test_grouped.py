"""Result grouping (Searcher.search_grouped): top-N hits per group,
groups ranked by their best hit — vs a brute-force python grouping and
vs search_collapse at k_per_group=1."""

import pytest

from montezuma_spark.fixtures import search_docs_df
from montezuma_spark.index import FieldConfig, IndexConfig, build_index
from montezuma_spark.search import Searcher, TermQuery

CFG = IndexConfig(
    fields=[FieldConfig("field", "field", "whitespace")],
    key_col="url", shard_bits=3, block_size=4,
    store_cols=("cat",),
)


@pytest.fixture(scope="module")
def searcher(spark):
    return Searcher(build_index(spark, search_docs_df(spark), CFG))


def _brute(searcher, q, group_col, k_groups, k_per_group):
    hits = searcher.top_docs(q, k=None)
    gmap = {}
    for d, _sc in hits:
        doc = searcher.get_document(d)
        gmap[d] = doc[group_col]
    groups = {}
    for d, sc in sorted(hits, key=lambda t: (-t[1], t[0])):
        groups.setdefault(gmap[d], []).append((d, sc))
    ranked = sorted(
        groups.items(), key=lambda kv: (-kv[1][0][1], kv[1][0][0])
    )[:k_groups]
    out = []
    for g, rows in ranked:
        for d, sc in rows[:k_per_group]:
            out.append((g, d, sc))
    return out


def _collect(df, group_col):
    return [
        (r[group_col], int(r["docid"]), float(r["score"]))
        for r in df.collect()
    ]


@pytest.mark.parametrize("kg,kpg", [(10, 2), (2, 3), (10, 1), (3, 100)])
def test_matches_bruteforce(searcher, kg, kpg):
    q = TermQuery("field", "word3")
    got = _collect(searcher.search_grouped(q, "cat", kg, kpg), "cat")
    want = _brute(searcher, q, "cat", kg, kpg)
    assert [(g, d, pytest.approx(s)) for g, d, s in want] == got


def test_k_per_group_1_equals_collapse(searcher):
    q = TermQuery("field", "word2")
    grouped = _collect(searcher.search_grouped(q, "cat", 10, 1), "cat")
    collapsed = _collect(searcher.search_collapse(q, "cat", k=10), "cat")
    assert grouped == collapsed


def test_null_group_values_are_kept(spark):
    """Regression: the per-partition pandas pruner must not drop
    NULL-group hits (pandas groupby dropna default) — collapse and the
    Spark groupBy both treat NULL as a group."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "url": [f"u{i:02d}" for i in range(6)],
            "text": ["alpha"] * 6,
            "cat": ["a", None, "b", None, "a", None],
        }
    )
    cfg = IndexConfig(
        fields=[FieldConfig("text", "text", "whitespace")],
        key_col="url", shard_bits=2, store_cols=("cat",),
    )
    s = Searcher(build_index(spark, spark.createDataFrame(pdf), cfg))
    out = s.search_grouped(TermQuery("text", "alpha"), "cat", 10, 2)
    rows = [(r["cat"], int(r["docid"])) for r in out.collect()]
    assert sum(1 for c, _ in rows if c is None) == 2  # null group top-2
    assert {c for c, _ in rows} == {"a", "b", None}


def test_distributed_tier_agrees(spark, searcher):
    dist = Searcher(searcher.index, distributed=True)
    q = TermQuery("field", "word1")
    a = _collect(searcher.search_grouped(q, "cat", 5, 2), "cat")
    b = _collect(dist.search_grouped(q, "cat", 5, 2), "cat")
    assert a == b and len(a) > 0
