"""Approximate-nearest-neighbor search over embedding columns.

Two tiers (both deterministic, both declarative DataFrame ops so each has
an exact ANSI-SQL oracle):

* brute-force cosine top-k   — the exact baseline (queries.py ann_cosine_topk)
* hyperplane-LSH bucketed    — the scale path: sign-random-projection
  signatures (Charikar 2002), banded into buckets; candidates = vectors
  sharing >=1 band with the query, then exact cosine rerank of candidates
  only. Also powers embedding near-duplicate pairs.

Hyperplanes are generated once from a fixed seed and embedded as literal
arrays in both the Spark plan and the SQL oracle, so signatures match
bit-for-bit. Scale notes: the signature computation is one narrow
projection (explode x dims, groupBy id — shuffle bounded by n·planes);
the candidate join is an equi-join on (band_id, band_val) buckets; exact
rerank touches only candidate rows. At 10^9+ vectors, replace the
explode-based dot products with a pandas_udf matmul over the same literal
plane matrix — semantics (and the oracle) stay identical.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LSH_SEED = 12345
NUM_PLANES = 16
BAND_BITS = 4  # 4 bands of 4 bits


def lsh_planes(dim: int = 64, num_planes: int = NUM_PLANES,
               seed: int = LSH_SEED) -> np.ndarray:
    """Deterministic Gaussian hyperplanes (num_planes x dim), float64."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def _planes_array_lit(planes: np.ndarray):
    """Literal array<array<double>> column of the plane matrix."""
    return F.array(
        *[
            F.array(*[F.lit(float(v)) for v in row])
            for row in planes
        ]
    )


def lsh_signatures(emb: DataFrame, planes: np.ndarray,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, sig long): bit p of sig = (embedding . plane_p >= 0).

    Declarative: posexplode the embedding once, join each element against
    the literal plane matrix, aggregate per (id, plane). Sum order inside
    a group is engine-dependent, but plane dot products are O(1) away from
    zero for real data, so the sign — and hence the signature — is stable
    across engines (verified against the DuckDB oracle).
    """
    nplanes = planes.shape[0]
    pl = _planes_array_lit(planes)
    ex = emb.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("i", "ev"),
    ).withColumn("ev", F.col("ev").cast("double"))
    ex = ex.withColumn(
        "p", F.explode(F.sequence(F.lit(0), F.lit(nplanes - 1)))
    ).withColumn(
        "pv",
        F.element_at(F.element_at(pl, F.col("p") + 1), F.col("i") + 1),
    )
    dots = ex.groupBy(id_col, "p").agg(
        F.sum(F.col("ev") * F.col("pv")).alias("dot")
    )
    return dots.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("dot") >= 0,
                # shiftleft builtin needs a literal shift; p is a column
                F.expr("shiftleft(CAST(1 AS BIGINT), p)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("sig")
    )


def _bands(sig_col, num_planes: int = NUM_PLANES, band_bits: int = BAND_BITS):
    nbands = num_planes // band_bits
    mask = (1 << band_bits) - 1
    return F.array(
        *[
            F.shiftright(sig_col, b * band_bits).bitwiseAND(F.lit(mask))
            for b in range(nbands)
        ]
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "vec_id",
                        num_planes: int = NUM_PLANES,
                        band_bits: int = BAND_BITS) -> DataFrame:
    """DISTINCT (id_a < id_b) pairs sharing >=1 signature band."""
    keyed = sigs.select(
        F.col(id_col),
        F.posexplode(_bands(F.col("sig"), num_planes, band_bits)).alias(
            "band_id", "band_val"
        ),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def cosine_join(emb: DataFrame, pairs: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """pairs(id_a, id_b) -> (id_a, id_b, cos) exact cosine via explode-sum.

    Fixed left-to-right element order inside the sum is NOT relied upon —
    see lsh_signatures docstring; rounding happens in the caller.
    """
    ex = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("i", "ev")
    ).withColumn("ev", F.col("ev").cast("double"))
    norms = ex.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("ev") * F.col("ev"))).alias("nrm")
    )
    ea = ex.select(
        F.col(id_col).alias("id_a"), F.col("i"), F.col("ev").alias("ev_a")
    )
    eb = ex.select(
        F.col(id_col).alias("id_b"), F.col("i"), F.col("ev").alias("ev_b")
    )
    dots = (
        pairs.join(ea, "id_a")
        .join(eb, ["id_b", "i"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("ev_a") * F.col("ev_b")).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("nrm").alias("nrm_b"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a", "id_b",
            (F.col("dot") / (F.col("nrm_a") * F.col("nrm_b"))).alias("cos"),
        )
    )


def lsh_topk(emb: DataFrame, query_id: int, k: int = 10,
             planes: np.ndarray | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """LSH-bucketed top-k for one query vector already in the table:
    candidates = vectors sharing >=1 band with the query signature, then
    exact cosine rerank. Returns (id, cos) ordered (cos desc, id asc)."""
    head = emb.filter(F.col(id_col) == query_id).select(vec_col).head()
    if head is None:
        raise ValueError(f"query {id_col}={query_id} not found in table")
    qvec = np.asarray([float(x) for x in head[vec_col]], dtype=np.float64)
    if planes is None:
        planes = lsh_planes(dim=len(qvec))
    # query signature computed driver-side with the same >= 0 rule
    qsig = 0
    for p, row in enumerate(planes):
        if float(np.dot(row, qvec)) >= 0:
            qsig |= 1 << p
    nbands = planes.shape[0] // BAND_BITS
    mask = (1 << BAND_BITS) - 1
    qbands = [(b, (qsig >> (b * BAND_BITS)) & mask) for b in range(nbands)]
    sigs = lsh_signatures(emb, planes, id_col, vec_col)
    keyed = sigs.select(
        F.col(id_col),
        F.posexplode(_bands(F.col("sig"))).alias("band_id", "band_val"),
    )
    band_pred = None
    for b, v in qbands:
        c = (F.col("band_id") == b) & (F.col("band_val") == v)
        band_pred = c if band_pred is None else (band_pred | c)
    cand = (
        keyed.filter(band_pred)
        .select(id_col)
        .distinct()
        .filter(F.col(id_col) != query_id)
    )
    # exact rerank of candidates against the (broadcast) query vector
    qnorm = math.sqrt(float(np.dot(qvec, qvec)))
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    ex = (
        emb.join(cand, id_col)
        .select(F.col(id_col), F.posexplode(vec_col).alias("i", "ev"))
        .withColumn("ev", F.col("ev").cast("double"))
        .withColumn("qv", F.element_at(qlit, F.col("i") + 1))
    )
    sums = ex.groupBy(id_col).agg(
        F.sum(F.col("ev") * F.col("qv")).alias("dot"),
        F.sum(F.col("ev") * F.col("ev")).alias("nn"),
    )
    cos = F.col("dot") / (F.sqrt("nn") * F.lit(qnorm))
    return (
        sums.select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.4,
                            planes: np.ndarray | None = None,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs: LSH band candidates -> exact cosine
    >= threshold. The scalable analog of an O(n^2) similarity self-join."""
    if planes is None:
        dim = len(emb.select(vec_col).head()[vec_col])
        planes = lsh_planes(dim=dim)
    sigs = lsh_signatures(emb, planes, id_col, vec_col)
    pairs = lsh_candidate_pairs(sigs, id_col)
    return cosine_join(emb, pairs, id_col, vec_col).filter(
        F.col("cos") >= threshold
    )


def planes_sql_values(planes: np.ndarray) -> str:
    """VALUES clause of (p, vec) rows for the DuckDB oracle — the same
    literal plane matrix the Spark plan uses."""
    rows = []
    for p, row in enumerate(planes):
        vec = ", ".join(repr(float(v)) for v in row)
        rows.append(f"({p}, [{vec}])")
    return ",\n  ".join(rows)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> probe -> exact rerank
# ---------------------------------------------------------------------------

NUM_CENTROIDS = 16
NPROBE = 4
IVF_SEED = 54321


def ivf_centroids(dim: int = 64, n: int = NUM_CENTROIDS,
                  seed: int = IVF_SEED) -> np.ndarray:
    """Deterministic unit-norm centroids (n x dim).

    Random (data-independent) centroids keep the whole pipeline — and its
    SQL oracle — a pure function of the seed. At production scale you would
    train them (Spark ML KMeans over a sample) and broadcast the trained
    matrix; every plan below is unchanged, only the literals differ.
    """
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, cid): each vector assigned to its max-dot-product centroid
    (centroids are unit-norm, so this is cosine assignment).

    Declarative (explode x centroids, groupBy, max_by) so DuckDB's
    arg_max reproduces it exactly. Shuffle bounded by n·centroids; at
    10^9+ vectors swap the explode for a pandas_udf matmul against the
    same broadcast centroid matrix — semantics identical.
    """
    ncent = centroids.shape[0]
    cl = _planes_array_lit(centroids)
    ex = emb.select(
        F.col(id_col), F.posexplode(vec_col).alias("i", "ev")
    ).withColumn("ev", F.col("ev").cast("double"))
    ex = ex.withColumn(
        "c", F.explode(F.sequence(F.lit(0), F.lit(ncent - 1)))
    ).withColumn(
        "cv", F.element_at(F.element_at(cl, F.col("c") + 1), F.col("i") + 1)
    )
    dots = ex.groupBy(id_col, "c").agg(
        F.sum(F.col("ev") * F.col("cv")).alias("dot")
    )
    return dots.groupBy(id_col).agg(F.expr("max_by(c, dot)").alias("cid"))


def ivf_topk(emb: DataFrame, query_id: int = 0, k: int = 10,
             nprobe: int = NPROBE, centroids: np.ndarray | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN for one query vector already in the table: probe the
    ``nprobe`` nearest centroid cells, exact cosine rerank of their
    members. Returns (id, cos) ordered (cos desc, id asc).

    Scale shape (10^12 vectors): the assignment table is written once,
    PARTITIONED BY cid (an Iceberg partition transform), so a query scans
    only nprobe partitions — the postings-list analog for vectors."""
    head = emb.filter(F.col(id_col) == query_id).select(vec_col).head()
    if head is None:
        raise ValueError(f"query {id_col}={query_id} not found in table")
    qvec = np.asarray([float(x) for x in head[vec_col]], dtype=np.float64)
    if centroids is None:
        centroids = ivf_centroids(dim=len(qvec))
    qdots = centroids @ qvec
    probe = [
        int(c) for c in np.lexsort((np.arange(len(qdots)), -qdots))[:nprobe]
    ]
    assign = ivf_assign(emb, centroids, id_col, vec_col)
    cand = assign.filter(F.col("cid").isin(probe)).filter(
        F.col(id_col) != query_id
    )
    qnorm = math.sqrt(float(np.dot(qvec, qvec)))
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    ex = (
        emb.join(cand.select(id_col), id_col)
        .select(F.col(id_col), F.posexplode(vec_col).alias("i", "ev"))
        .withColumn("ev", F.col("ev").cast("double"))
        .withColumn("qv", F.element_at(qlit, F.col("i") + 1))
    )
    sums = ex.groupBy(id_col).agg(
        F.sum(F.col("ev") * F.col("qv")).alias("dot"),
        F.sum(F.col("ev") * F.col("ev")).alias("nn"),
    )
    cos = F.col("dot") / (F.sqrt("nn") * F.lit(qnorm))
    return (
        sums.select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )
