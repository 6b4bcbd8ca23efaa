"""Source adapters: the web-pages input table and saved-index tables.

The north-star input is an Iceberg table of Common-Crawl-style pages
(url, warc_ts, html, text, lang). In this sandbox there is no Iceberg
catalog, so the adapter resolves, in order:

1. a catalog table name (``db.table`` / ``catalog.db.table``) via
   ``spark.read.table`` — this is the Iceberg path on a real cluster
   (Iceberg registers as a catalog; partition pruning / snapshot reads
   come through the table read automatically);
2. a filesystem path (contains a separator or ends in .parquet) via
   ``spark.read.parquet``.

Column pruning and predicate pushdown behave identically for both: the
build reads only (key, text-ish) columns, and saved-index postings scans
push (field, term) equality predicates into the scan (see
tests/test_pushdown.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

WEB_PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def _looks_like_path(source: str) -> bool:
    return (
        "/" in source
        or source.endswith(".parquet")
        or source.startswith(("file:", "s3:", "s3a:", "hdfs:", "gs:", "abfs:"))
    )


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """Read an input table from an Iceberg/catalog table name or a parquet
    path (see module docstring for resolution order)."""
    if _looks_like_path(source):
        return spark.read.parquet(source)
    return spark.read.table(source)


def read_web_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read the web-pages input, validating the expected columns exist
    (extra columns are fine; ordering is not significant)."""
    df = read_table(spark, source)
    missing = [c for c in ("url", "text") if c not in df.columns]
    if missing:
        raise ValueError(
            f"web_pages source {source!r} missing required columns {missing}; "
            f"expected shape {WEB_PAGES_COLUMNS}"
        )
    return df
