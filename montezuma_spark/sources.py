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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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


# Block-level HTML constructs whose boundaries become newlines in the
# extracted text (a tag soup "<p>a</p><p>b</p>" must not fuse to "ab").
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|li|ul|ol|tr|td|th|table|thead|tbody|h[1-6]|"
    r"blockquote|section|article|header|footer|nav|pre|form)(?:\s[^>]*)?>"
    r"|(?i)<br\s*/?>"
)

# The five XML named entities plus &nbsp;, decoded innermost-last so
# "&amp;lt;" round-trips to the literal "&lt;" (standard decode order).
_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
)


def extract_text_col(html_col: Column) -> Column:
    """Deterministic HTML→text extraction as a pure column expression.

    The whole chain is JVM-side ``regexp_replace`` (whole-stage codegen,
    no Python worker), so the extracted bytes are a pure function of the
    input bytes — the per-row invariant the input contract requires
    ("byte-identical extracted text per url") holds independent of
    partitioning, parallelism, or executor count.

    Contract (documented, test-pinned in tests/test_extract_text.py):

    1. decode the ``binary`` payload as UTF-8;
    2. drop ``<script>``/``<style>`` subtrees and ``<!-- -->`` comments;
    3. block-level tag boundaries (p/div/li/h1-6/br/...) become ``\\n``;
    4. every remaining tag is removed;
    5. the XML named entities (+ ``&nbsp;``) are decoded, ``&amp;`` last;
    6. whitespace runs around newlines collapse to one newline, multiple
       newlines collapse to one, and the result is trimmed.

    Inline markup is removed without inserting whitespace, so text whose
    markup is flush against the content (the fixture's
    ``<html><body>{t}</body></html>`` wrapping, inline ``<b>``/``<a>``
    spans) extracts byte-identically to the unwrapped text.
    """
    s = F.decode(html_col, "UTF-8")
    s = F.regexp_replace(s, r"(?is)<(script|style)(?:\s[^>]*)?>.*?</\1\s*>", "")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    s = F.regexp_replace(s, _BLOCK_TAG_RE, "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", "")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, r"[ \t\r]*\n[ \t\r]*", "\n")
    s = F.regexp_replace(s, r"\n{2,}", "\n")
    # Spark's trim() strips only spaces; strip boundary newlines explicitly.
    return F.trim(F.regexp_replace(s, r"^\n+|\n+$", ""))


def extract_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "text") -> DataFrame:
    """Add/replace ``out_col`` with the deterministic extraction of
    ``html_col`` (see ``extract_text_col`` for the byte-level contract)."""
    return df.withColumn(out_col, extract_text_col(F.col(html_col)))


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
