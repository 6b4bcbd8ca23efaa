"""Physical-plan checks: the saved index's dictionary layout must let
Catalyst push query-term predicates into the parquet scan (the .tii
two-level-dictionary analog, SURVEY.md §4.2), and the source adapter must
resolve both table names and paths."""

import pytest
from pyspark.sql import functions as F

from montezuma_spark.fixtures import synth_web_pages_df
from montezuma_spark.index import FieldConfig, IndexConfig, Index, build_index
from montezuma_spark.sources import read_table, read_web_pages


@pytest.fixture(scope="module")
def saved(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pushdown") / "ix")
    cfg = IndexConfig(fields=[FieldConfig("text", "text", "simple")],
                      shard_bits=5)
    build_index(spark, synth_web_pages_df(spark, 150), cfg, index_dir=d)
    return Index.load(spark, d)


def test_term_predicate_pushed_to_parquet_scan(spark, saved, capsys):
    scan = saved.postings.filter(
        (F.col("field") == "text") & (F.col("term") == "merge")
    ).select("term", "df", "postings")
    scan.explain("formatted")
    plan = capsys.readouterr().out
    assert "PushedFilters" in plan
    # the (field, term) equality predicates reach the scan
    assert "EqualTo(term,merge)" in plan or "EqualTo(term, merge)" in plan
    # column pruning: the positions sidecar is NOT read for this projection
    assert "positions" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_doc_map_broadcast_join_plan(spark, saved, capsys):
    """The docid→key hydration join must broadcast the (tiny) result side,
    never shuffle doc_map."""
    hits = saved.spark.createDataFrame([(3,), (7,)], "docid long")
    out = F.broadcast(hits).join(saved.doc_map, "docid", "inner")
    out.explain("formatted")
    plan = capsys.readouterr().out
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_read_table_path_and_name(spark, tmp_path):
    df = synth_web_pages_df(spark, 10)
    p = str(tmp_path / "wp.parquet")
    df.write.parquet(p)
    # path form
    assert read_web_pages(spark, p).count() == 10
    # catalog/table-name form (temp view stands in for the Iceberg catalog)
    df.createOrReplaceTempView("wp_view")
    assert read_table(spark, "wp_view").count() == 10
    with pytest.raises(ValueError, match="missing required columns"):
        spark.range(3).write.parquet(str(tmp_path / "bad.parquet"))
        read_web_pages(spark, str(tmp_path / "bad.parquet"))
