"""extract_text: the input-contract invariant — byte-identical extracted
text per url, independent of partitioning/parallelism.

The extraction chain is pure JVM-side regexp_replace (no Python worker),
so determinism follows from Spark's expression semantics; these tests pin
the byte-level contract and the no-UDF plan property.
"""

import pyspark.sql.functions as F
import pytest

from montezuma_spark.fixtures import synth_web_pages_df
from montezuma_spark.sources import extract_text, extract_text_col


def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html.encode("utf-8"),)], "html binary")
    return df.select(extract_text_col(F.col("html")).alias("t")).first()["t"]


def test_fixture_byte_identity(spark):
    """Every synthesized page extracts byte-identically to its text column."""
    pages = synth_web_pages_df(spark, 500).repartition(8)
    got = extract_text(pages, out_col="extracted")
    mismatches = got.filter(F.col("extracted") != F.col("text")).count()
    assert mismatches == 0


def test_byte_identity_independent_of_partitioning(spark):
    """Same rows, different parallelism → identical extracted bytes per url."""
    pages = synth_web_pages_df(spark, 200)
    one = {
        r["url"]: r["extracted"]
        for r in extract_text(pages.coalesce(1), out_col="extracted")
        .select("url", "extracted").collect()
    }
    many = {
        r["url"]: r["extracted"]
        for r in extract_text(pages.repartition(8), out_col="extracted")
        .select("url", "extracted").collect()
    }
    assert one == many


@pytest.mark.parametrize(
    "html,expected",
    [
        ("<html><body>hello world</body></html>", "hello world"),
        # inline markup removed without inserting whitespace
        ("<p>an <b>inline</b> span and <a href='/x'>a link</a></p>",
         "an inline span and a link"),
        # block boundaries become newlines; tag soup never fuses words
        ("<p>alpha</p><p>beta</p>", "alpha\nbeta"),
        ("line one<br>line two<br/>line three", "line one\nline two\nline three"),
        ("<div>a</div><div>b</div><ul><li>c</li><li>d</li></ul>", "a\nb\nc\nd"),
        # script/style subtrees and comments dropped entirely
        ("<body>keep<script>var x = '<p>no</p>';</script> this</body>",
         "keep this"),
        ("<style type='text/css'>p { color: red }</style>text", "text"),
        ("before<!-- a <b>comment</b> -->after", "beforeafter"),
        # entities; &amp; decoded last so double-encoding round-trips
        ("2 &lt; 3 &amp;&amp; 4 &gt; 1", "2 < 3 && 4 > 1"),
        ("&quot;q&quot; &#39;a&#39; &apos;b&apos;", "\"q\" 'a' 'b'"),
        ("&amp;lt;", "&lt;"),
        ("a&nbsp;b", "a b"),
        # whitespace normalization around block boundaries
        ("<p>  padded  </p>\n\n<p>next</p>", "padded\nnext"),
        ("<h1>Title</h1><table><tr><td>x</td><td>y</td></tr></table>",
         "Title\nx\ny"),
        # attributes containing '>' -adjacent constructs stay well-formed
        ('<a href="u" title="t">anchored</a>', "anchored"),
    ],
)
def test_extraction_goldens(spark, html, expected):
    assert _extract_one(spark, html) == expected


def test_extraction_stays_jvm_side(spark):
    """The plan must contain no Python evaluation node — the invariant's
    determinism argument rests on whole-stage-codegen expressions."""
    pages = synth_web_pages_df(spark, 10)
    plan = extract_text(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_utf8_multibyte_passthrough(spark):
    html = "<html><body>naïve café — 東京 🚀</body></html>"
    assert _extract_one(spark, html) == "naïve café — 東京 🚀"
