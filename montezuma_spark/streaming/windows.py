"""Event-time streaming aggregations over the web-pages stream.

The reference has no streaming constructs (SURVEY.md §2.8); these are the
Spark-native operators a live ingest of the same table needs alongside the
segment-per-batch indexer (incremental.py):

* ``windowed_doc_counts`` — tumbling event-time windows on ``warc_ts`` with
  a watermark, so late pages update their window until the watermark passes
  and state is dropped (bounded state at 10^12-doc scale).
* ``running_lang_totals`` — a custom stateful operator via
  ``applyInPandasWithState``: per-language running document/byte totals
  maintained in group state across micro-batches.

Both run identically on a batch DataFrame (minus the watermark), which the
tests exploit for golden checks.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "lang string, total_docs long, total_chars long"
RUNNING_TOTALS_STATE = "total_docs long, total_chars long"


def windowed_doc_counts(
    docs: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "lang",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Docs + bytes per (event-time window, key); watermarked when the
    input is a stream so window state is dropped once late data can no
    longer arrive."""
    if docs.isStreaming:
        docs = docs.withWatermark(ts_col, watermark)
    return (
        docs.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_docs",
            "n_chars",
        )
    )


def sessionized(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization via the built-in ``session_window``: events
    of a key share a session while each arrives within ``gap`` of the
    session's current end (start = first event ts, end = last event ts +
    gap; an event landing exactly ON the boundary still extends the
    session — measured, so the oracle's break condition must be strict
    ``ts > prev + gap``). Watermarked when streaming so closed sessions
    are finalized and their state dropped — bounded state at web scale.
    Batch and streaming share the identical plan, which the
    ``st_sessions`` contract entry exploits (gaps-and-islands oracle)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count("*").cast("long").alias("n_events")]
    out_cols = ["n_events"]
    if value_col is not None:
        # lossless: contract-layer rounding lives in the st_sessions
        # wrapper, like windowed_doc_counts' raw aggregates
        aggs.append(F.sum(value_col).alias("sum_value"))
        out_cols.append("sum_value")
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            *out_cols,
        )
    )


def _totals_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (lang,) = key
    if state.exists:
        docs, chars = state.get
    else:
        docs, chars = 0, 0
    for pdf in pdfs:
        docs += len(pdf)
        chars += int(pdf["text"].str.len().sum())
    state.update((docs, chars))
    yield pd.DataFrame(
        {"lang": [lang], "total_docs": [docs], "total_chars": [chars]}
    )


def running_lang_totals(docs: DataFrame, key_col: str = "lang") -> DataFrame:
    """Per-key running totals across micro-batches via group state —
    the custom-stateful-operator surface (applyInPandasWithState)."""
    return (
        docs.select(key_col, "text")
        .groupBy(key_col)
        .applyInPandasWithState(
            _totals_fn,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
