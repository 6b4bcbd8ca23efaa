"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the inverted index over the sf0.001
``documents`` table and answer a parsed BM25 query, returning top-10 with
urls. ``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(full-text engine, text analysis, dedup, ANN); see montezuma_spark/queries.py
for both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from montezuma_spark.queries import get_index
    from montezuma_spark.search.parser import QueryParser

    _, searcher = get_index(spark, "/root/testdata/sf0.001")
    q = QueryParser(default_field="text", analyzer="simple").parse(
        "+spark merge vector"
    )
    out = searcher.search(q, k=10)
    return out.select("docid", "key", F.round(F.col("score"), 6).alias("score"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from montezuma_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from montezuma_spark.queries import get_oracle

    return get_oracle()
