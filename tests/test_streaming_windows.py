"""Event-time windowed aggregation (watermark) + applyInPandasWithState
running totals, driven through real Structured Streaming file sources."""

import time

import pytest
from pyspark.sql import functions as F

from montezuma_spark.fixtures import synth_web_pages_pdf
from montezuma_spark.streaming.windows import (
    running_lang_totals,
    windowed_doc_counts,
)


def _paged(spark, n=60):
    pdf = synth_web_pages_pdf(n)
    df = spark.createDataFrame(pdf)
    # spread warc_ts across three 10-minute windows deterministically
    return df.withColumn(
        "warc_ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(mins=(F.col("doc_num") % 3) * 10)
        if "doc_num" in df.columns
        else F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(
            mins=(F.abs(F.xxhash64("url")) % 3).cast("int") * 10
        ),
    )


def test_windowed_counts_batch_golden(spark):
    docs = _paged(spark)
    out = windowed_doc_counts(docs, window="10 minutes").toPandas()
    # 3 windows x languages; totals conserve doc count
    assert out["n_docs"].sum() == 60
    assert (out.groupby("window_start")["n_docs"].sum() > 0).all()
    assert len(out["window_start"].unique()) == 3


def test_streaming_window_and_state(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    docs = _paged(spark)
    schema = docs.schema
    # first batch: half the docs
    docs.filter(F.abs(F.xxhash64("url")) % 2 == 0).write.parquet(
        str(src / "b0.parquet")
    )
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*.parquet")

    win_q = (
        windowed_doc_counts(stream, window="10 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("win_tbl")
        .outputMode("update")
        .start()
    )
    tot_q = (
        running_lang_totals(stream)
        .writeStream.format("memory")
        .queryName("tot_tbl")
        .outputMode("update")
        .start()
    )
    try:
        win_q.processAllAvailable()
        tot_q.processAllAvailable()
        n1 = spark.sql(
            "SELECT sum(n_docs) AS n FROM win_tbl"
        ).collect()[0]["n"]
        assert n1 and n1 > 0
        # second batch arrives: state must accumulate, windows update
        docs.filter(F.abs(F.xxhash64("url")) % 2 == 1).write.parquet(
            str(src / "b1.parquet")
        )
        win_q.processAllAvailable()
        tot_q.processAllAvailable()
        # running totals: latest row per lang sums to all 60 docs
        tot = spark.sql(
            "SELECT lang, max(total_docs) AS d FROM tot_tbl GROUP BY lang"
        ).toPandas()
        assert int(tot["d"].sum()) == 60
        # windowed counts: latest update per (window, lang) sums to 60
        win = spark.sql(
            "SELECT window_start, lang, max(n_docs) AS n FROM win_tbl "
            "GROUP BY window_start, lang"
        ).toPandas()
        assert int(win["n"].sum()) == 60
        batch_golden = windowed_doc_counts(
            _paged(spark), window="10 minutes"
        ).toPandas()
        g = batch_golden.sort_values(["window_start", "lang"]).reset_index(
            drop=True
        )
        w = win.sort_values(["window_start", "lang"]).reset_index(drop=True)
        assert list(g["n_docs"]) == list(w["n"])
    finally:
        win_q.stop()
        tot_q.stop()
