"""Persisted MinHash band store: streaming near-dup probes vs the
indexed corpus (montezuma_spark.neardup_store)."""

import pytest
from pyspark.sql import functions as F

from montezuma_spark.neardup_store import MinHashStore


@pytest.fixture(scope="module")
def spark():
    from montezuma_spark.session import get_spark

    yield get_spark("neardup-store-tests", cores=8, shuffle_partitions=8)


BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "merges sorted posting segments into a global term dictionary and "
    "the scheduler assigns docid ranges to worker shards"
)
OTHER = (
    "an unrelated treatise on watermarks sessionization and streaming "
    "state stores with windows triggers and exactly once sinks for "
    "event time aggregation pipelines at arbitrary scale"
)


def _toks(spark, rows):
    return spark.createDataFrame(rows, "docid long, text string").select(
        "docid",
        F.expr("transform(regexp_extract_all(text, '[a-zA-Z]+', 0), "
               "x -> lower(x))").alias("toks"),
    )


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    corpus = _toks(spark, [(0, BASE), (1, OTHER), (2, "tiny")])
    d = str(tmp_path_factory.mktemp("mhstore") / "store")
    st = MinHashStore.build(spark, corpus, d, num_hashes=8, band_rows=1)
    return MinHashStore.load(spark, d)  # reload: artifacts, not session


def test_probe_finds_corpus_near_dup(spark, store):
    batch = _toks(spark, [
        (100, BASE.replace("lazy", "sleepy")),   # near-dup of 0
        (101, "completely fresh content about bit packed posting "
              "cells block max metadata and impact ordered fronts"),
    ])
    pairs = store.near_dups(batch, threshold=0.5).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in pairs} == {(100, 0)}
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_dedup_gate_keeps_fresh_rows(spark, store):
    batch = spark.createDataFrame(
        [(100, BASE.replace("lazy", "sleepy")),
         (101, "fresh content words entirely disjoint from anything "
               "stored in the corpus store today")],
        "docid long, text string",
    ).withColumn(
        "toks",
        F.expr("transform(regexp_extract_all(text, '[a-zA-Z]+', 0), "
               "x -> lower(x))"),
    )
    kept = store.dedup_gate(batch, threshold=0.5)
    assert [r["docid"] for r in kept.select("docid").collect()] == [101]


def test_probe_join_path_matches_pushdown(spark, store):
    batch = _toks(spark, [(100, BASE.replace("lazy", "sleepy")),
                          (101, OTHER.replace("arbitrary", "vast"))])
    a = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in store.near_dups(batch, threshold=0.3).collect()
    )
    b = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in store.near_dups(
            batch, threshold=0.3, pushdown_max_values=0
        ).collect()
    )
    assert a == b and a  # same pairs via literal pushdown and join


def test_add_batch_extends_corpus(spark, tmp_path_factory):
    corpus = _toks(spark, [(0, BASE)])
    d = str(tmp_path_factory.mktemp("mhstore2") / "store")
    st = MinHashStore.build(spark, corpus, d, num_hashes=8, band_rows=1)
    st.add_batch(_toks(spark, [(50, OTHER)]))
    probe = _toks(spark, [(200, OTHER.replace("arbitrary", "vast"))])
    pairs = st.near_dups(probe, threshold=0.5).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in pairs} == {(200, 50)}
    # reload after append sees both generations
    st2 = MinHashStore.load(spark, d)
    assert {(r["batch_id"], r["corpus_id"])
            for r in st2.near_dups(probe, threshold=0.5).collect()} == {
        (200, 50)
    }


def test_short_docs_never_match(spark, store):
    batch = _toks(spark, [(300, "ti ny")])  # < ngram tokens: no shingles
    assert store.near_dups(batch, threshold=0.1).collect() == []


def test_all_short_corpus_store_matches_nothing(spark, tmp_path_factory):
    corpus = _toks(spark, [(0, "a b"), (1, "x")])  # every doc < ngram
    d = str(tmp_path_factory.mktemp("mhstore3") / "store")
    st = MinHashStore.build(spark, corpus, d, num_hashes=8, band_rows=1)
    st = MinHashStore.load(spark, d)
    batch = _toks(spark, [(9, BASE)])
    assert st.near_dups(batch, threshold=0.1).collect() == []
    kept = st.dedup_gate(batch)
    assert [r["docid"] for r in kept.select("docid").collect()] == [9]
