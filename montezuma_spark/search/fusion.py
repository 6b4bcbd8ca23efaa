"""Rank fusion — combine bounded top-k lists from heterogeneous retrievers.

Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
``score(d) = Σ_i  w_i / (c + rank_i(d))`` over the input lists that
contain ``d``. Beyond-reference, labeled: the reference engine
(/root/reference, Montezuma 0.1.3) has no fusion surface — this is the
standard web-scale hybrid-serving pattern (BM25 candidates ⊕ ANN
candidates fused into one ranking), added here because the engine ships
both retrievers (Searcher + AnnIndex).

Scale design: every input is truncated to its top-``depth`` rows
(``orderBy(score desc, key asc).limit(depth)``) BEFORE rank assignment,
so the fusion operates on ≤ n_lists × depth rows by construction —
broadcast-scale, never table-scale. The one-task rank window is
therefore the correct plan here (the CLAUDE.md invariant bans
unpartitioned rank windows over TABLE-sized data — those go through
``queries.rank_docids``; fusion inputs are k-row retriever outputs).
The downstream groupBy/orderBy run on the same bounded row count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["rrf_fuse", "hybrid_topk"]


def rrf_fuse(
    ranked: Sequence[DataFrame],
    key_col: str = "docid",
    score_col: str = "score",
    k: int = 10,
    c: int = 60,
    depth: int = 100,
    weights: Sequence[float] | None = None,
) -> DataFrame:
    """Fuse top-k lists by Reciprocal Rank Fusion.

    ``ranked``: DataFrames each holding (``key_col``, ``score_col``);
    per-list rank is (score desc, key asc) — the engine-wide tie-break —
    over the list's top-``depth`` rows. Returns (key_col, rrf) ordered
    (rrf desc, key asc), ``k`` rows. ``weights`` (default all 1.0)
    scales each list's contribution; ``c`` damps the head (SIGIR'09
    uses 60).
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked input")
    if weights is None:
        weights = [1.0] * len(ranked)
    if len(weights) != len(ranked):
        raise ValueError(
            f"{len(weights)} weights for {len(ranked)} ranked inputs"
        )
    order = [F.desc(score_col), F.asc(key_col)]
    w = Window.orderBy(*order)  # bounded input: ≤ depth rows (see module doc)
    parts = []
    for df, wt in zip(ranked, weights):
        top = (
            df.select(key_col, score_col).orderBy(*order).limit(depth)
        )
        parts.append(
            top.withColumn("_r", F.row_number().over(w)).select(
                F.col(key_col),
                (F.lit(float(wt)) / (F.lit(float(c)) + F.col("_r"))).alias(
                    "_rrf"
                ),
            )
        )
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    return (
        fused.groupBy(key_col)
        .agg(F.sum("_rrf").alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(key_col))
        .limit(k)
    )


def hybrid_topk(
    searcher,
    query,
    vectors: DataFrame,
    qvec,
    k: int = 10,
    depth: int = 100,
    c: int = 60,
    weights: Sequence[float] = (1.0, 1.0),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+vector retrieval: BM25 top-``depth`` from
    ``searcher`` fused (RRF) with exact-cosine top-``depth`` of
    ``vectors`` against ``qvec``. The vector table's ``id_col`` must key
    the same corpus rows as the index's docids. Returns (docid, rrf).

    Both candidate stages are the engine's bounded top-k plans (the
    search kernel / ``ann.rerank_topk``'s Arrow-batched scan +
    TakeOrderedAndProject) — only ≤ 2 × depth rows reach the fusion.
    For repeated serving swap the exact rerank for an ``AnnIndex``
    probe (``lsh_topk`` / ``ivf_topk``) — any (id, score) frame fuses.
    """
    from montezuma_spark.ann import rerank_topk

    lex = searcher.search(query, k=depth).select("docid", "score")
    vec = rerank_topk(vectors, qvec, k=depth, id_col=id_col,
                      vec_col=vec_col)
    vec = vec.select(
        F.col(id_col).cast("long").alias("docid"),
        F.col("cos").alias("score"),
    )
    return rrf_fuse(
        [lex, vec], key_col="docid", score_col="score",
        k=k, c=c, depth=depth, weights=weights,
    )
