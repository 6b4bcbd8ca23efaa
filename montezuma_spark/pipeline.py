"""End-to-end corpus preparation for web-scale training data / indexing:
quality filters → exact dedup → near-dup clustering → canonical selection.

This is the composition layer over the graded operators — the single
entry point a 100-TB nightly pipeline runs before ``build_index`` or an
export to a training shard store. Every stage is the scale-shaped form
of the corresponding contract operator:

* quality gate      — pure column expressions (length, distinct ratio,
                      top-token fraction, duplicate 3-gram fraction: the
                      Gopher-rules family) — no shuffle.
* exact dedup       — ONE md5 groupBy keeping the smallest docid.
* near-dup dedup    — MinHash-band candidates → exact shingle-Jaccard
                      verify (``dedup.ngram_jaccard_pairs``: banded
                      equi-join, never all-pairs) → connected components
                      (``dedup.connected_components``: O(log n) rounds)
                      → one kept doc per cluster
                      (``dedup.canonical_docs``: struct-max groupBy).

Stage survivor counts land in the caller's ``report`` dict — a pipeline
that silently drops 40% of a corpus is an incident, not a detail, so the
counts are first-class rather than an afterthought. The counts are also
what makes the run resumable-by-stage at scale: each count is an action
over a persisted intermediate, so a scheduler can checkpoint between
stages.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montezuma_spark.dedup import (
    canonical_docs,
    connected_components,
    ngram_jaccard_pairs,
)


@dataclass(frozen=True)
class QualityThresholds:
    """Gopher-rules-style keep gates (Rae et al. 2021 §A1.1); a doc must
    pass ALL of them. Defaults are permissive — tune per corpus."""

    min_tokens: int = 5
    max_tokens: int = 1_000_000
    max_top_token_frac: float = 0.5   # most frequent token's share
    min_distinct_ratio: float = 0.1   # distinct/total tokens
    max_dup_3gram_frac: float = 0.5   # duplicate 3-gram share


def _quality_cols(toks_col: str = "toks") -> list:
    """The per-doc quality signal columns (pure expressions, no shuffle),
    every one O(dl log dl) or better per row. ``top_token_frac`` is the
    longest equal-run of the SORTED token array via one ``aggregate``
    fold — never the transform-× -filter form, whose O(distinct × dl)
    rescan stalls a task on a single pathological web doc before any
    length gate can drop it. (The cross-corpus aggregate form lives in
    the contract's ``ta_repetition``: exploded + partial-agg groupBys.)"""
    toks = F.col(toks_col)
    total = F.greatest(F.size(toks), F.lit(1))
    run0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _run_step(acc, x):
        nxt = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            nxt.alias("run"),
            F.greatest(acc["best"], nxt).alias("best"),
        )

    top = F.aggregate(F.array_sort(toks), run0, _run_step)["best"]
    g3 = F.expr(
        f"CASE WHEN size({toks_col}) >= 3 THEN "
        f"transform(sequence(0, size({toks_col}) - 3), "
        f"i -> concat_ws(' ', slice({toks_col}, i + 1, 3))) "
        f"ELSE array() END"
    )
    return [
        F.size(toks).alias("n_tokens"),
        (F.coalesce(top, F.lit(0)) / total).alias("top_token_frac"),
        (F.size(F.array_distinct(toks)) / total).alias("distinct_ratio"),
        (
            (F.size(g3) - F.size(F.array_distinct(g3)))
            / F.greatest(F.size(g3), F.lit(1))
        ).alias("dup_3gram_frac"),
    ]


def quality_filter(docs_toks: DataFrame,
                   thresholds: QualityThresholds | None = None,
                   toks_col: str = "toks") -> DataFrame:
    """Docs passing every quality gate; adds the signal columns so the
    caller can audit near-threshold survivors."""
    th = thresholds or QualityThresholds()
    out = docs_toks.select("*", *_quality_cols(toks_col))
    return out.filter(
        (F.col("n_tokens") >= th.min_tokens)
        & (F.col("n_tokens") <= th.max_tokens)
        & (F.col("top_token_frac") <= th.max_top_token_frac)
        & (F.col("distinct_ratio") >= th.min_distinct_ratio)
        & (F.col("dup_3gram_frac") <= th.max_dup_3gram_frac)
    )


def prepare_corpus(docs: DataFrame, *, key_col: str = "url",
                   text_col: str = "text",
                   thresholds: QualityThresholds | None = None,
                   jaccard_threshold: float = 0.8,
                   minhash_hashes: int = 4, band_rows: int = 2,
                   report: dict | None = None,
                   persist_handle: list | None = None) -> DataFrame:
    """Quality-gate, exact-dedup, and near-dup-dedup a corpus; returns
    the KEPT rows of ``docs`` (original columns plus ``docid`` and the
    quality signal columns).

    Docids are rank-of-key (``queries.rank_docids`` — distributed, no
    single-task Window), so keep decisions are deterministic and
    independent of parallelism. Pass ``report={}`` to receive per-stage
    survivor counts.

    Scale shape: one range shuffle (docids) + one md5 groupBy (exact) +
    the banded near-dup joins + O(log n) component rounds — nothing
    quadratic, nothing driver-sized.
    """
    from montezuma_spark.queries import rank_docids

    toks = docs.withColumn(
        "toks",
        F.expr(
            f"transform(regexp_extract_all({text_col}, '[a-zA-Z]+', 0), "
            "x -> lower(x))"
        ),
    )
    # the ranked scan stays persisted: the returned plan's docids depend
    # on its pinned partition boundaries (the rank_docids invariant).
    # Pass ``persist_handle=[]`` to receive it and release once the
    # output is materialized; otherwise it lives until the session ends.
    handle: list = []
    ranked = rank_docids(toks, key_col, handle=handle).persist()
    n_input = ranked.count()
    for h in handle:
        h.unpersist()
    if persist_handle is not None:
        persist_handle.append(ranked)

    kept_q = quality_filter(ranked, thresholds).persist()
    n_quality = kept_q.count()

    # exact dedup: smallest docid per identical text survives
    exact_keep = (
        kept_q.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min("docid").alias("docid"))
        .select("docid")
    )
    uniq = kept_q.join(exact_keep, "docid").persist()
    n_exact = uniq.count()
    kept_q.unpersist()

    # near-dup: banded candidates -> exact Jaccard -> components -> keep
    # the longest doc per cluster (ties to the smallest docid)
    pairs = ngram_jaccard_pairs(
        uniq.select("docid", "toks"), threshold=jaccard_threshold,
        num_hashes=minhash_hashes, band_rows=band_rows,
        hash_family="affine",
    )
    clusters = connected_components(pairs, uniq.select("docid"))
    keep = canonical_docs(
        clusters, uniq.select("docid", F.col("n_tokens").alias("dl"))
    ).select(F.col("keep_docid").alias("docid"))
    out = uniq.join(keep, "docid").drop("toks")
    if report is not None:
        n_kept = out.count()
        report.update(
            n_input=n_input,
            n_quality_dropped=n_input - n_quality,
            n_exact_dropped=n_quality - n_exact,
            n_neardup_dropped=n_exact - n_kept,
            n_kept=n_kept,
        )
    # uniq stays persisted like ranked — the returned plan reads it, and
    # unpersisting before the caller materializes would recompute the
    # quality + exact-dedup stages for nothing
    if persist_handle is not None:
        persist_handle.append(uniq)
    return out
