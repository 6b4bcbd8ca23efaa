"""Rank fusion (search/fusion.py): RRF math vs brute force, depth
truncation, weights, and the hybrid lexical+vector composition."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from montezuma_spark.fixtures import simple_docs_df
from montezuma_spark.index import FieldConfig, IndexConfig, build_index
from montezuma_spark.search import Searcher, TermQuery
from montezuma_spark.search.fusion import hybrid_topk, rrf_fuse


def _rrf_brute(lists, k=10, c=60, depth=100, weights=None):
    """Pure-python RRF over [(docid, score), ...] lists."""
    if weights is None:
        weights = [1.0] * len(lists)
    acc = {}
    for rows, w in zip(lists, weights):
        top = sorted(rows, key=lambda t: (-t[1], t[0]))[:depth]
        for r, (d, _) in enumerate(top, start=1):
            acc[d] = acc.get(d, 0.0) + w / (c + r)
    out = sorted(acc.items(), key=lambda t: (-t[1], t[0]))[:k]
    return [(d, round(v, 9)) for d, v in out]


def _collect(df):
    return [
        (int(r["docid"]), round(float(r["rrf"]), 9)) for r in df.collect()
    ]


LIST_A = [(1, 9.0), (2, 8.0), (3, 7.0), (4, 6.0), (5, 5.0)]
LIST_B = [(3, 0.9), (6, 0.8), (1, 0.7), (7, 0.6)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "docid long, score double")


def test_rrf_matches_bruteforce(spark):
    got = _collect(
        rrf_fuse([_df(spark, LIST_A), _df(spark, LIST_B)], k=10)
    )
    assert got == _rrf_brute([LIST_A, LIST_B], k=10)


def test_rrf_depth_truncates(spark):
    got = _collect(
        rrf_fuse([_df(spark, LIST_A), _df(spark, LIST_B)], k=10, depth=2)
    )
    assert got == _rrf_brute([LIST_A, LIST_B], k=10, depth=2)
    # doc 5 (rank 5 in A, absent from B) must be gone at depth 2
    assert 5 not in {d for d, _ in got}


def test_rrf_weights_scale_contributions(spark):
    got = _collect(
        rrf_fuse(
            [_df(spark, LIST_A), _df(spark, LIST_B)],
            k=10, weights=[0.25, 2.0],
        )
    )
    assert got == _rrf_brute([LIST_A, LIST_B], k=10, weights=[0.25, 2.0])
    # B's top doc should now lead
    assert got[0][0] == 3


def test_rrf_single_list_is_rank_transform(spark):
    got = _collect(rrf_fuse([_df(spark, LIST_A)], k=3))
    assert got == _rrf_brute([LIST_A], k=3)
    assert [d for d, _ in got] == [1, 2, 3]


def test_rrf_score_ties_break_by_docid(spark):
    # same ranks in disjoint lists -> equal rrf, docid asc decides
    a = [(9, 1.0)]
    b = [(4, 1.0)]
    got = _collect(rrf_fuse([_df(spark, a), _df(spark, b)], k=2))
    assert [d for d, _ in got] == [4, 9]
    assert got[0][1] == got[1][1]


def test_rrf_validates_inputs(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([_df(spark, LIST_A)], weights=[1.0, 2.0])


def test_hybrid_topk_matches_componentwise_fusion(spark):
    cfg = IndexConfig(
        fields=[FieldConfig("text", "text", "whitespace")],
        key_col="url", shard_bits=3, block_size=4,
    )
    s = Searcher(build_index(spark, simple_docs_df(spark), cfg))

    # deterministic embeddings keyed by the known docids (rank of url)
    rng = np.random.RandomState(7)
    vecs = rng.randn(8, 16).astype(np.float64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    qvec = vecs[0]

    got = _collect(
        hybrid_topk(s, TermQuery("text", "one"), emb, qvec,
                    k=5, depth=4)
    )

    lex = [
        (int(r["docid"]), float(r["score"]))
        for r in s.search(TermQuery("text", "one"), k=4).collect()
    ]
    qn = np.linalg.norm(qvec)
    vec = [
        (i, float(vecs[i] @ qvec / (np.linalg.norm(vecs[i]) * qn)))
        for i in range(8)
    ]
    assert got == _rrf_brute([lex, vec], k=5, depth=4)


def test_hybrid_output_is_bounded_and_ordered(spark):
    cfg = IndexConfig(
        fields=[FieldConfig("text", "text", "whitespace")],
        key_col="url", shard_bits=3, block_size=4,
    )
    s = Searcher(build_index(spark, simple_docs_df(spark), cfg))
    emb = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_topk(
        s, TermQuery("text", "two"), emb, np.array([1.0, 0.5]), k=3,
        depth=8,
    )
    rows = out.collect()
    assert len(rows) == 3
    vals = [float(r["rrf"]) for r in rows]
    assert vals == sorted(vals, reverse=True)
