"""End-to-end corpus-preparation pipeline: quality gates -> exact dedup
-> near-dup clustering -> canonical keep (montezuma_spark.pipeline)."""

import pytest
from pyspark.sql import functions as F

from montezuma_spark.pipeline import (
    QualityThresholds,
    prepare_corpus,
    quality_filter,
)


@pytest.fixture(scope="module")
def spark():
    from montezuma_spark.session import get_spark

    s = get_spark("pipeline-tests", cores=8, shuffle_partitions=8)
    yield s


def _corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the spark "
        "engine merges sorted posting segments into a global dictionary "
        "and the scheduler assigns docid ranges to shards"
    )
    near = base.replace("lazy", "sleepy")  # one-token edit: near-dup
    rows = [
        ("u01", base),
        ("u02", base),                       # exact dup of u01
        ("u03", near),                       # near-dup of u01
        ("u04", "spam " * 60),               # repetitive: top_token_frac 1
        ("u05", "tiny doc"),                 # under min_tokens
        ("u06", "a completely different document about window functions "
                "watermarks sessionization and streaming state stores "
                "with enough ordinary tokens to pass every quality gate"),
    ]
    return spark.createDataFrame(rows, "url string, text string")


def test_quality_filter_gates(spark):
    docs = _corpus(spark).withColumn(
        "toks",
        F.expr("transform(regexp_extract_all(text, '[a-zA-Z]+', 0), "
               "x -> lower(x))"),
    )
    kept = quality_filter(
        docs, QualityThresholds(min_tokens=10, max_top_token_frac=0.3)
    )
    urls = {r["url"] for r in kept.select("url").collect()}
    assert "u04" not in urls          # repetitive
    assert "u05" not in urls          # too short
    assert {"u01", "u02", "u03", "u06"} <= urls
    sig = kept.filter("url = 'u06'").head()
    assert 0.0 <= sig["dup_3gram_frac"] < 0.2
    assert sig["distinct_ratio"] > 0.5


def test_prepare_corpus_end_to_end(spark):
    report: dict = {}
    handle: list = []
    out = prepare_corpus(
        _corpus(spark),
        thresholds=QualityThresholds(min_tokens=10,
                                     max_top_token_frac=0.3),
        jaccard_threshold=0.5,
        minhash_hashes=8, band_rows=1,
        report=report,
        persist_handle=handle,
    )
    rows = out.select("url", "docid", "n_tokens").collect()
    urls = {r["url"] for r in rows}
    # u02 exact-dup-dropped (u01 has the smaller rank-of-url docid);
    # u03 near-dup-clustered with u01 — equal length, min docid kept
    assert urls == {"u01", "u06"}
    assert report == {
        "n_input": 6,
        "n_quality_dropped": 2,
        "n_exact_dropped": 1,
        "n_neardup_dropped": 1,
        "n_kept": 2,
    }
    # docids are rank-of-url
    docids = {r["url"]: r["docid"] for r in rows}
    assert docids["u01"] == 0
    for h in handle:
        h.unpersist()


def test_prepare_corpus_keeps_longest_in_cluster(spark):
    long_doc = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    longer = long_doc + " phi chi psi omega extra tokens here"
    docs = spark.createDataFrame(
        [("a", long_doc), ("b", longer)], "url string, text string"
    )
    out = prepare_corpus(
        docs, thresholds=QualityThresholds(min_tokens=1),
        jaccard_threshold=0.5, minhash_hashes=8, band_rows=1,
    )
    assert [r["url"] for r in out.select("url").collect()] == ["b"]
