"""Event-time windowed aggregation (watermark) + applyInPandasWithState
running totals, driven through real Structured Streaming file sources."""

import time

import pytest
from pyspark.sql import functions as F

from montezuma_spark.fixtures import synth_web_pages_pdf
from montezuma_spark.streaming.windows import (
    running_lang_totals,
    sessionized,
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


def _session_events(spark):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: 0s, 100s (in gap), 220s (EXACTLY prev+120 — must merge),
        # 500s (> prev+120 — new session)
        (1, base, 1.0),
        (1, base + dt.timedelta(seconds=100), 2.0),
        (1, base + dt.timedelta(seconds=220), 4.0),
        (1, base + dt.timedelta(seconds=500), 8.0),
        # user 2: single event
        (2, base + dt.timedelta(seconds=50), 16.0),
    ]
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, value double"
    )


def test_sessionized_batch_golden(spark):
    out = (
        sessionized(_session_events(spark), gap="120 seconds",
                    value_col="value")
        .orderBy("user_id", "session_start")
        .toPandas()
    )
    got = [
        (r.user_id, str(r.session_start), str(r.session_end),
         r.n_events, r.sum_value)
        for r in out.itertuples()
    ]
    assert got == [
        # boundary event at prev+gap extends the session (3 events, not 2)
        (1, "2026-01-01 00:00:00", "2026-01-01 00:05:40", 3, 7.0),
        (1, "2026-01-01 00:08:20", "2026-01-01 00:10:20", 1, 8.0),
        (2, "2026-01-01 00:00:50", "2026-01-01 00:02:50", 1, 16.0),
    ]


def test_sessionized_streaming_matches_batch(spark, tmp_path):
    src = tmp_path / "sess_src"
    src.mkdir()
    ev = _session_events(spark)
    ev.write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema(ev.schema).parquet(
        str(src) + "/*.parquet"
    )
    q = (
        sessionized(stream, gap="120 seconds", watermark="1 hour",
                    value_col="value")
        .writeStream.format("memory")
        .queryName("sess_tbl")
        # session windows reject update mode (merging sessions can't be
        # keyed); complete re-emits the full result each micro-batch
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT user_id, session_start, n_events, sum_value "
            "FROM sess_tbl ORDER BY user_id, session_start"
        ).toPandas()
        golden = (
            sessionized(ev, gap="120 seconds", value_col="value")
            .orderBy("user_id", "session_start")
            .toPandas()
        )
        assert list(got["n_events"]) == list(golden["n_events"])
        assert list(got["sum_value"]) == list(golden["sum_value"])
        assert [str(t) for t in got["session_start"]] == [
            str(t) for t in golden["session_start"]
        ]
    finally:
        q.stop()


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
