"""Deduplication & fingerprinting operators for web-scale corpora.

These go beyond the reference engine (Montezuma has no dedup — it is a
search library) and cover what a 100 TB training-data pipeline needs:

* exact dedup            — hash groupBy (in queries.py: dd_exact_groups)
* MinHash signatures     — per-doc k min-hashes over distinct features
                           (n-gram shingles on the near-dup path; two hash
                           families — k×md5, or one md5 + k affine maps
                           whose cost is k-independent for wide signatures)
* MinHash band join      — LSH candidate pairs (banding: b bands of r rows)
* n-gram Jaccard verify  — exact Jaccard over distinct token 3-gram shingles
                           for band-colliding candidate pairs only
* SimHash                — 32-bit weighted-bit fingerprint (Charikar 2002)
* winnowing fingerprints — rolling min-hash over k-gram windows
                           (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
* cluster assignment     — connected components over the pair graph
                           (min-label propagation + pointer jumping)
* canonical selection    — one kept doc per cluster (struct-max groupBy)

Everything is declarative DataFrame ops (JVM-side, codegen-friendly, no
Python UDFs), so each operator has an exact ANSI-SQL oracle and Catalyst
handles pushdown. Scale notes per operator below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenized-docs helpers (shared shape: docid long, toks array<string>)
# ---------------------------------------------------------------------------


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram shingle strings from a token array (order-preserving
    construction, then dedup). Empty array when the doc has < n tokens —
    ``sequence`` would descend otherwise."""
    gram = F.expr(
        f"transform(sequence(0, size({toks._jc.toString()}) - {n}), "
        f"i -> concat_ws(' ', slice({toks._jc.toString()}, i + 1, {n})))"
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(gram)
    ).otherwise(F.array().cast("array<string>"))


def _shingles_expr(col: str, n: int = 3) -> str:
    return (
        f"CASE WHEN size({col}) >= {n} THEN array_distinct("
        f"transform(sequence(0, size({col}) - {n}), "
        f"i -> concat_ws(' ', slice({col}, i + 1, {n})))) "
        f"ELSE array() END"
    )


MINHASH_P = (1 << 31) - 1  # Mersenne prime: universal-hash modulus


def minhash_affine_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine hash family — a fixed
    splitmix64 stream, so the Spark plan and the SQL oracle template the
    IDENTICAL constants. a ∈ [1, P), b ∈ [0, P)."""
    mask = (1 << 64) - 1
    x = 0x5EED1E57BA5EBA11

    def nxt() -> int:
        nonlocal x
        x = (x + 0x9E3779B97F4A7C15) & mask
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return z ^ (z >> 31)

    return [
        (nxt() % (MINHASH_P - 1) + 1, nxt() % MINHASH_P)
        for _ in range(num_hashes)
    ]


def minhash_signature(tokens_df: DataFrame, num_hashes: int = 4,
                      id_col: str = "docid", tok_col: str = "tok",
                      hash_family: str = "md5") -> DataFrame:
    """(id, tok) distinct pairs → (id, m0..m{k-1}) min-hash signature.

    Hash families:

    * ``"md5"`` (default) — min of ``md5("{i}:" || tok)`` hex strings
      (hex min ≡ uint128 min). Cost: k md5s per token — fine for small k.
    * ``"affine"`` — ONE md5 per token reduced to h ∈ [0, P), then
      k affine maps ``(aᵢ·h + bᵢ) mod P`` (P = 2³¹−1, the classic
      universal family). Hashing cost is k-independent, which is what
      makes wide signatures (k ≥ 16, needed to keep random band
      collisions sub-quadratic at web scale) affordable: products stay
      < 2⁶² so the arithmetic is exact in both Spark longs and DuckDB
      BIGINTs — no overflow, no wrap divergence.

    Scale: one groupBy on id — a single shuffle keyed by doc; skew-free
    (every doc is its own group).
    """
    if hash_family == "affine":
        reduced = tokens_df.select(
            F.col(id_col), feature_hash(F.col(tok_col)).alias("_hm")
        )
        aggs = [
            F.min((F.col("_hm") * F.lit(a) + F.lit(b)) % MINHASH_P)
            .alias(f"m{i}")
            for i, (a, b) in enumerate(minhash_affine_params(num_hashes))
        ]
        return reduced.groupBy(id_col).agg(*aggs)
    aggs = [
        F.min(
            F.md5(F.encode(F.concat(F.lit(f"{i}:"), F.col(tok_col)), "UTF-8"))
        ).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    return tokens_df.groupBy(id_col).agg(*aggs)


def feature_hash(col: Column) -> Column:
    """The affine family's feature reduction: md5-low32 of the UTF-8
    bytes, mod P — ONE definition shared by the signature path, the
    MinHashStore shingle sidecar, and (as templated SQL) the oracles; a
    divergent copy would silently break the sign-what-you-verify
    invariant."""
    return (
        F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 8), 16, 10)
        .cast("long") % MINHASH_P
    )


def minhash_signature_from_hashes(hashes_df: DataFrame,
                                  num_hashes: int = 4,
                                  id_col: str = "docid",
                                  hm_col: str = "hm") -> DataFrame:
    """Affine-family signature from PRE-HASHED features: (id, hm) rows
    with hm ∈ [0, P) → (id, m0..m{k-1}). The tail of the "affine" branch
    of :func:`minhash_signature` — for callers that persist the hashed
    feature sets (e.g. ``MinHashStore`` shingle sidecars) and must not
    pay the md5 step twice."""
    aggs = [
        F.min((F.col(hm_col) * F.lit(a) + F.lit(b)) % MINHASH_P)
        .alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_affine_params(num_hashes))
    ]
    return hashes_df.groupBy(id_col).agg(*aggs)


def band_values(sig: DataFrame, num_hashes: int, band_rows: int,
                id_col: str = "docid") -> DataFrame:
    """(id, band_id, band_val) rows from a signature frame: b =
    num_hashes/band_rows bands, band_val the ':'-joined hash values
    (':'-separated so variable-width affine-family ints can never alias
    across row boundaries — "1"+"23" vs "12"+"3")."""
    assert num_hashes % band_rows == 0
    nbands = num_hashes // band_rows
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                *[
                    F.col(f"m{b * band_rows + r}").cast("string")
                    for r in range(band_rows)
                ],
            )
            for b in range(nbands)
        ]
    )
    return sig.select(
        F.col(id_col), F.posexplode(bands).alias("band_id", "band_val")
    )


def minhash_band_pairs(sig: DataFrame, num_hashes: int = 4, band_rows: int = 2,
                       id_col: str = "docid",
                       max_bucket: int | None = None) -> DataFrame:
    """LSH banding: b = num_hashes/band_rows bands of r = band_rows hashes.
    Returns DISTINCT candidate pairs (id_a < id_b) colliding in ≥1 band.

    ``max_bucket``: drop band buckets holding more than this many docs
    before the self-join. Oversized buckets are boilerplate signatures —
    docs sharing a common template's min-shingles, not near-duplicates
    of each other — and each contributes O(size²) candidate pairs, which
    is where banding quietly re-acquires a quadratic term on redundant
    web corpora. A true near-dup pair's bucket holds ~2 docs (its band
    value includes the pair's own content), so a generous cap (e.g. 64)
    costs ~no recall while pinning candidate growth linear; the
    verified-pair output of the 1M-doc scale arm is identical with and
    without it. None (default) disables — the exact-SQL-oracle contract
    path stays cap-free.

    Scale: the band join is an equi-join on (band_id, band_val) — hot
    buckets (boilerplate-heavy shards) are bounded because band_val
    joins r full hash values; residual skew is AQE's skew-join
    territory. Candidate count ≪ n² by design — but ONLY if r is deep
    enough for the corpus: random pairs collide per band with
    probability ≈ E[J^r], and at web scale r = 4 leaves a quadratic
    residue (measured: candidate growth exponent 1.57 at 1M docs with
    r=4 vs 1.0 with r=6 — see tools/dedup_ann_arm.py). Pair the
    ``affine`` hash family with r ≥ 6 so signature width stays cheap.
    """
    keyed = band_values(sig, num_hashes, band_rows, id_col)
    if max_bucket is not None:
        # hot-bucket list is tiny (boilerplate patterns) → broadcast
        # anti-join; one extra groupBy over the already-shuffled keys
        hot = (
            keyed.groupBy("band_id", "band_val")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("band_id", "band_val")
        )
        keyed = keyed.join(
            F.broadcast(hot), ["band_id", "band_val"], "left_anti"
        )
    a = keyed.alias("a")
    b = keyed.alias("b")
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


def ngram_jaccard_pairs(docs_toks: DataFrame, threshold: float = 0.8,
                        n: int = 3, num_hashes: int = 4, band_rows: int = 2,
                        id_col: str = "docid",
                        toks_col: str = "toks",
                        cand: DataFrame | None = None,
                        hash_family: str = "md5") -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard, with MinHash-band
    candidate generation (the scalable path: verify only colliding pairs).

    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold, computed over
    DISTINCT token n-gram shingles.

    Signatures are built over the SAME n-gram shingles the verify step
    intersects — the banding probability is then a function of the exact
    Jaccard being thresholded. (An earlier version signed distinct
    TOKENS: on boilerplate-heavy corpora the token-set Jaccard of
    *unrelated* docs is high even when their shingle Jaccard is ~0, and
    the candidate set degenerated quadratically — measured 10.5M
    candidates across 5 000 docs on the sf0.1 table vs 441 with shingle
    signatures, identical verified output.)

    ``cand``: optional precomputed (id_a, id_b) candidate pairs (e.g. a
    persisted ``minhash_band_pairs`` result the caller also counts) —
    skips signature recomputation.

    Scale: shingle arrays are re-joined per candidate pair — 2 broadcast-or-
    shuffle hash joins keyed by id; the O(n²) verify is avoided entirely.
    """
    sh = docs_toks.select(
        F.col(id_col),
        F.expr(_shingles_expr(toks_col, n)).alias("sh"),
    )
    if cand is None:
        grams = sh.select(F.col(id_col), F.explode("sh").alias("tok"))
        sig = minhash_signature(grams, num_hashes, id_col=id_col,
                                hash_family=hash_family)
        cand = minhash_band_pairs(sig, num_hashes, band_rows, id_col=id_col)
    j = (
        cand.join(sh.withColumnRenamed(id_col, "id_a")
                    .withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b")
                .withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.greatest(F.size(F.array_union("sh_a", "sh_b")), F.lit(1)),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def simhash(tokens_tf: DataFrame, bits: int = 32, id_col: str = "docid",
            tok_col: str = "tok", tf_col: str = "tf") -> DataFrame:
    """SimHash fingerprint: bit b of the signature is 1 iff
    Σ_tok tf · (bit_b(h(tok)) ? +1 : −1) > 0, h = first 32 bits of md5.

    Input: (id, tok, tf) — one row per distinct token per doc.
    Output: (id, simhash long).

    Integer weights → no float-order sensitivity; exactly replicable in SQL.
    Scale: ONE groupBy keyed by id with ``bits`` sum columns — partial
    (map-side) aggregation applies, so shuffle volume is docs × bits
    *longs*, and no row amplification ever happens (an explode ×bits
    formulation pushed docs × tokens × bits rows into the shuffle — 2.2B
    rows at 1M docs — and was this operator's scale ceiling).
    """
    assert 1 <= bits <= 64
    md5 = F.md5(F.encode(F.col(tok_col), "UTF-8"))
    if bits <= 32:
        h = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    else:
        # 64-bit fingerprints (Manku/Jain/Sarma, WWW 2007 use 64 bits at
        # web scale — pigeonhole chunk width bits/(d+1) governs candidate
        # volume, so wider is the scale knob): assemble from two 32-bit
        # halves — conv() of 16 hex digits would overflow a signed long
        h = F.shiftleft(
            F.conv(F.substring(md5, 1, 8), 16, 10).cast("long"), 32
        ).bitwiseOR(F.conv(F.substring(md5, 9, 8), 16, 10).cast("long"))

    def bit_lit(b: int):
        # 1<<63 exceeds Long.MAX as a Python literal; its two's-complement
        # value is Long.MIN
        return F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")

    # materialize h (and tf) once before fanning out to ``bits`` columns:
    # inlining the md5 expression into every conditional would hash each
    # token ``bits`` times (common-subexpression elimination across
    # conditional branches is not guaranteed)
    hashed = tokens_tf.select(
        F.col(id_col),
        F.col(tf_col).cast("long").alias("_tf"),
        h.alias("_h"),
    )
    tf = F.col("_tf")
    per_tok = hashed.select(
        F.col(id_col),
        *[
            F.when(F.col("_h").bitwiseAND(bit_lit(b)) != 0, tf)
            .otherwise(-tf)
            .alias(f"c{b}")
            for b in range(bits)
        ],
    )
    w = per_tok.groupBy(id_col).agg(
        *[F.sum(f"c{b}").alias(f"w{b}") for b in range(bits)]
    )
    bit_terms = [
        F.when(F.col(f"w{b}") > 0, bit_lit(b))
        .otherwise(F.lit(0).cast("long"))
        for b in range(bits)
    ]
    # disjoint bit patterns: bitwise OR assembly (addition would be
    # equivalent for bits<64 but the sign bit makes OR the honest form)
    acc = bit_terms[0]
    for t in bit_terms[1:]:
        acc = acc.bitwiseOR(t)
    return w.select(F.col(id_col), acc.alias("simhash"))


def simhash_pairs(sigs: DataFrame, max_distance: int = 3, bits: int = 32,
                  id_col: str = "docid",
                  sig_col: str = "simhash") -> DataFrame:
    """Near-duplicate pairs within hamming distance ``max_distance`` of
    their SimHash fingerprints — the banding join that turns the
    fingerprint column into a usable dedup operator at scale.

    Pigeonhole: split the ``bits``-bit fingerprint into ``max_distance+1``
    chunks; any pair within distance d must agree EXACTLY on at least one
    chunk (d flipped bits cannot touch all d+1 chunks). Candidates come
    from an equi-join on (chunk_id, chunk_val) — never an all-pairs
    product — then a popcount of the XOR verifies the true distance.

    Output: (id_a, id_b, hamming), id_a < id_b, hamming ≤ max_distance.

    Scale: candidate volume is governed by chunk width bits/(d+1); hot
    buckets (a common chunk value) are the LSH skew case — AQE skew-join
    handles the residue, same as minhash_band_pairs.
    """
    nchunks = max_distance + 1
    base, rem = divmod(bits, nchunks)
    chunks = []
    start = 0
    for t in range(nchunks):
        width = base + (1 if t < rem else 0)
        mask = (1 << width) - 1
        chunks.append(
            F.struct(
                F.lit(t).alias("chunk_id"),
                F.shiftright(F.col(sig_col), start)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_val"),
            )
        )
        start += width
    keyed = sigs.select(
        F.col(id_col), F.col(sig_col), F.explode(F.array(*chunks)).alias("c")
    ).select(id_col, sig_col, "c.chunk_id", "c.chunk_val")
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{sig_col}").alias("sig_a"),
            F.col(f"b.{sig_col}").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(sig_a ^ sig_b)").cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


def winnow_fingerprints(docs_toks: DataFrame, k: int = 3, w: int = 4,
                        id_col: str = "docid",
                        toks_col: str = "toks") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003): hash every
    token k-gram (md5, lexicographic order ≡ uint128 order), slide a window
    of ``w`` consecutive k-gram hashes, keep the window minimum, dedup.

    Output: (id, fp) — one row per selected fingerprint. Guarantees any
    shared run of ≥ w+k−1 tokens yields ≥1 shared fingerprint, so matching
    on fp finds partial overlaps exact/minhash dedup misses.

    Scale: per-row array ops only (no shuffle until the caller groups by
    fp); fingerprint density ≈ 2/(w+1) of all k-grams.
    """
    grams = (
        f"CASE WHEN size({toks_col}) >= {k} THEN "
        f"transform(sequence(0, size({toks_col}) - {k}), "
        f"i -> md5(concat_ws(' ', slice({toks_col}, i + 1, {k})))) "
        f"ELSE array() END"
    )
    wins = (
        f"CASE WHEN size(_hs) >= {w} THEN array_distinct("
        f"transform(sequence(0, size(_hs) - {w}), "
        f"j -> array_min(slice(_hs, j + 1, {w})))) "
        f"ELSE array() END"
    )
    return (
        docs_toks.select(F.col(id_col), F.expr(grams).alias("_hs"))
        .select(F.col(id_col), F.explode(F.expr(wins)).alias("fp"))
    )


def connected_components(edges: DataFrame, nodes: DataFrame,
                         id_col: str = "docid",
                         src_col: str = "id_a", dst_col: str = "id_b",
                         max_iters: int = 25,
                         stats: dict | None = None) -> DataFrame:
    """Near-dup cluster assignment: (id, cluster_id) where cluster_id is
    the MIN node id reachable from id through ``edges`` (singletons keep
    their own id). This is the step AFTER candidate pairs that every
    dedup pipeline needs — near-duplication is transitive in practice
    (a~b, b~c ⇒ keep one of {a,b,c}), so pairs must be resolved into
    components before a keep/drop decision can be made.

    Algorithm: iterative min-label propagation WITH pointer jumping —
    each round ``label ← min(label, min_{u∈N(v)} label(u))`` then
    ``label ← label[label]`` (the hash-to-min / pointer-doubling family,
    Rastogi et al. 2012). The doubling step bounds rounds at O(log n)
    even on path-shaped components, where plain propagation needs
    O(diameter) rounds.

    Scale notes (100 TB): each round is two keyed equi-joins plus one
    min-groupBy whose partial aggregation pre-reduces a giant
    component's label fan-in map-side (no hot-key shuffle; AQE handles
    residual skew). Lineage is truncated per round with
    ``localCheckpoint`` — tens of rounds of self-referential joins would
    otherwise compound the plan exponentially. Convergence is detected
    by a changed-label count, so already-quiet graphs stop after one
    round. Duplicate / both-direction edges are harmless under min-agg,
    so no ``distinct`` shuffle is spent on the edge list.
    """
    from pyspark import StorageLevel

    e = edges.select(
        F.col(src_col).cast("long").alias("s"),
        F.col(dst_col).cast("long").alias("d"),
    )
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    # pin the edge list ONCE: callers pass expensive plans (the full
    # banded-Jaccard pipeline) and the loop references `e` every round —
    # and the self-union alone would evaluate the input subtree twice
    # per job without this
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    lab = nodes.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(id_col).cast("long").alias("label"),
    ).localCheckpoint()
    changed = 0
    for rounds in range(1, max_iters + 1):
        if stats is not None:
            stats["rounds"] = rounds
        nmin = (
            e.join(
                lab.select(F.col("id").alias("s"),
                           F.col("label").alias("slabel")),
                "s",
            )
            .groupBy("d")
            .agg(F.min("slabel").alias("nlabel"))
        )
        l1 = (
            lab.join(nmin, lab["id"] == nmin["d"], "left")
            .select(
                lab["id"],
                F.least(
                    "label", F.coalesce("nlabel", "label")
                ).alias("l1"),
                lab["label"].alias("_old"),
            )
        )
        ptr = l1.select(F.col("id").alias("pid"), F.col("l1").alias("plabel"))
        new = (
            l1.join(ptr, l1["l1"] == ptr["pid"], "left")
            .select(
                "id",
                F.least("l1", F.coalesce("plabel", F.col("l1"))).alias("label"),
                "_old",
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("label") != F.col("_old")).count()
        lab = new.select("id", "label")
        if changed == 0:
            break
    e.unpersist()
    if stats is not None:
        stats["converged"] = changed == 0
    if changed != 0:
        # silently returning split components would under-dedup: a real
        # cluster keeps several canonical docs with no signal anywhere
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"rounds ({changed} labels still moving) — raise max_iters"
        )
    return lab.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )


def canonical_docs(clusters: DataFrame, quality: DataFrame,
                   id_col: str = "docid",
                   quality_col: str = "dl") -> DataFrame:
    """One kept doc per near-dup cluster: highest ``quality_col``, ties
    broken toward the smallest id. Input: ``clusters`` = (id, cluster_id)
    from :func:`connected_components`; ``quality`` = (id, quality_col).

    Output: (cluster_id, keep_docid, n_members).

    Scale: ONE groupBy with a struct-max aggregate — partial aggregation
    map-side (never a per-cluster sort window). ``-id`` rides the struct
    so the lexicographic max is (quality desc, id asc); ids are
    non-negative longs, so the negation cannot overflow.
    """
    q = clusters.join(
        quality.select(F.col(id_col), F.col(quality_col).alias("_q")),
        id_col,
    )
    picked = q.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col("_q").alias("q"),
                (-F.col(id_col)).cast("long").alias("negid"),
            )
        ).alias("_best"),
        F.count("*").alias("n_members"),
    )
    return picked.select(
        "cluster_id",
        (-F.col("_best.negid")).alias("keep_docid"),
        "n_members",
    )
