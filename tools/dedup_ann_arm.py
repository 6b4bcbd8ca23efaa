"""Dedup + ANN scale arm — sub-quadratic-growth evidence at ≥1M docs/vectors
(round-3 verdict item #2: the full-text build had 1M/2M-doc evidence, the
dedup/ANN operators had none beyond sf0.1).

Two scale points (n/4 and n) for the LSH dedup pipeline prove the candidate
set grows ~linearly (growth exponent ≈ 1.0 on a log/log docs→candidates fit;
an all-pairs O(n²) design would show ≈ 2.0):

* MinHash signatures → band candidate pairs → exact n-gram Jaccard verify
* SimHash fingerprints → pigeonhole-chunk candidate pairs → hamming verify

plus an AnnIndex build at ``n_vecs`` clustered vectors with IVF/LSH probe
latencies and recall@10 vs the exact rerank baseline.

Corpus: ``synth_corpus_spark(dup_every=10)`` — deterministic, 10% of docs
are one-token-edit near-duplicates, so every scale point carries real
near-dup structure (n/10 true pairs) on top of random band collisions.
Vectors: ``synth_embeddings_spark`` — 256 hash-derived clusters, unit-norm.

Emits one JSON line:

    DEDUP_ANN_RESULT {"dedup": {...}, "ann": {...}}

Usage: python tools/dedup_ann_arm.py [n_docs] [n_vecs] [cores]
(defaults 1_000_000 docs, 1_000_000 vectors, all CPUs; 0 skips a section).
bench.py runs it as a subprocess so BENCH_r{N}.json carries the numbers.
"""

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# web-scale parameters (NOT the tiny-corpus contract defaults): MinHash
# over 3-gram SHINGLES with the AFFINE hash family (one md5 + k affine
# maps — k-independent hashing cost, which is what makes a wide
# signature affordable) at 4 bands × 6 rows. Band depth is the
# sub-quadratic knob: random band collisions grow ~ E[J^r]·n², and the
# first run of this arm measured r=4 leaving a quadratic residue
# (candidate growth exponent 1.57 between 250k and 1M docs: 0.36 →
# 0.80 candidates/doc); at r=6 a J≈0.03 random pair collides at ~1e-9
# per band while the J=0.93 one-token-edit dup still hits 0.93⁶=0.65
# per band → 1−(1−0.65)⁴ = 0.985 recall over 4 bands. SimHash at 64
# bits (Manku et al., WWW 2007) so the pigeonhole chunks are 16 bits
# wide — 32-bit chunks of 8 bits collide every n²/2⁸ pairs, which is
# quadratic blow-up at 1M docs
MINHASH_HASHES = 24
MINHASH_BAND_ROWS = 6
# boilerplate-bucket cap (dedup.minhash_band_pairs max_bucket): buckets
# larger than this are template signatures whose O(size²) pair fan-out
# re-acquires the quadratic term; true near-dup buckets hold ~2 docs.
# Verified-pair output measured identical with/without (99 568 at 1M).
MINHASH_MAX_BUCKET = 64
SIMHASH_BITS = 64


def _dedup_point(spark, n_docs: int, vocab_size: int) -> dict:
    """One dedup scale point: candidate/verified pair counts + timings."""
    from pyspark.sql import functions as F

    from montezuma_spark.dedup import (
        canonical_docs,
        connected_components,
        minhash_band_pairs,
        minhash_signature,
        ngram_jaccard_pairs,
        shingles,
        simhash,
        simhash_pairs,
    )
    from montezuma_spark.fixtures import synth_corpus_spark

    docs = synth_corpus_spark(spark, n_docs, vocab_size=vocab_size,
                              dup_every=10)
    toks = docs.select(
        F.substring("url", -12, 12).cast("long").alias("docid"),
        F.split("text", " ").alias("toks"),
    ).persist()
    toks.count()
    tok = toks.select("docid", F.explode("toks").alias("tok"))
    sh = toks.select(
        "docid", F.explode(shingles(F.col("toks"), 3)).alias("tok")
    )

    out = {"n_docs": n_docs}

    t0 = time.time()
    sig = minhash_signature(sh, num_hashes=MINHASH_HASHES,
                            hash_family="affine")
    cand = minhash_band_pairs(
        sig, num_hashes=MINHASH_HASHES, band_rows=MINHASH_BAND_ROWS,
        max_bucket=MINHASH_MAX_BUCKET,
    ).persist()
    out["minhash_candidates"] = cand.count()
    out["minhash_seconds"] = round(time.time() - t0, 2)
    out["minhash_max_bucket"] = MINHASH_MAX_BUCKET

    t0 = time.time()
    ver = ngram_jaccard_pairs(toks, threshold=0.8, cand=cand).persist()
    out["jaccard_pairs"] = ver.count()
    out["jaccard_seconds"] = round(time.time() - t0, 2)
    cand.unpersist()

    # cluster assignment + canonical selection over the verified pairs —
    # the keep/drop end of the pipeline (dedup.connected_components /
    # canonical_docs); rounds should stay O(log n) flat across points
    t0 = time.time()
    ccs: dict = {}
    cl = connected_components(
        ver.select("id_a", "id_b"), toks.select("docid"), stats=ccs
    )
    out["n_clusters"] = cl.select("cluster_id").distinct().count()
    out["cluster_rounds"] = ccs.get("rounds")
    out["cluster_seconds"] = round(time.time() - t0, 2)
    t0 = time.time()
    keep = canonical_docs(
        cl, toks.select("docid", F.size("toks").alias("dl"))
    )
    out["docs_kept"] = keep.count()
    out["canonical_seconds"] = round(time.time() - t0, 2)
    ver.unpersist()

    t0 = time.time()
    tf = tok.groupBy("docid", "tok").agg(F.count("*").alias("tf"))
    pairs = simhash_pairs(
        simhash(tf, bits=SIMHASH_BITS), max_distance=3, bits=SIMHASH_BITS
    )
    out["simhash_pairs"] = pairs.count()
    out["simhash_seconds"] = round(time.time() - t0, 2)
    toks.unpersist()
    return out


def _growth(lo: dict, hi: dict, key: str) -> float | None:
    """log-log growth exponent of ``key`` between the two scale points
    (1.0 = linear, 2.0 = quadratic)."""
    if not lo.get(key) or not hi.get(key):
        return None
    return round(
        math.log(hi[key] / lo[key]) / math.log(hi["n_docs"] / lo["n_docs"]), 3
    )


def _ann_arm(spark, n_vecs: int, work_dir: str) -> dict:
    """AnnIndex build at n_vecs + probe latency/recall vs exact rerank."""
    import numpy as np
    from pyspark.sql import functions as F

    from montezuma_spark.ann import (
        AnnIndex,
        IVF_TRAIN_CAP,
        ivf_train_centroids_local,
        rerank_topk,
    )
    from montezuma_spark.fixtures import synth_embeddings_spark

    emb = synth_embeddings_spark(spark, n_vecs).persist()
    emb.count()
    # scale the coarse quantizer AND the LSH bands with the table (the
    # library defaults — 16 cells, 4 bands x 4 bits — are sized for the
    # tiny contract tables; nprobe/ncells is the fraction of the table
    # every IVF probe reads, and ~n/2^band_bits is the bucket size every
    # LSH probe fetches: 4-bit bands at 1M vectors mean 62k-row buckets,
    # and clustered data skews buckets several x above uniform)
    big = n_vecs >= 100_000
    n_cent = 256 if big else 16
    n_planes, b_bits = (64, 16) if big else (16, 4)
    t0 = time.time()
    sample = (
        emb.orderBy("vec_id").limit(IVF_TRAIN_CAP).toPandas()["embedding"]
    )
    cents = ivf_train_centroids_local(
        np.stack(sample.map(np.asarray)), n=n_cent
    )
    train_s = time.time() - t0
    t0 = time.time()
    ix = AnnIndex.build(
        spark, emb, f"{work_dir}/ann_ix", dim=64, centroids=cents,
        num_centroids=n_cent, num_planes=n_planes, band_bits=b_bits,
    )
    build_s = time.time() - t0
    # PQ tier timed SEPARATELY (add_pq: train + encode + write) so
    # build_seconds/vectors_per_sec stay comparable to prior rounds —
    # folding it in would read as a build regression cross-session
    t0 = time.time()
    ix.add_pq(True, pq_ksub=256 if big else 16)
    pq_build_s = time.time() - t0

    qids = [7, 123_457, 500_009, 777_781, n_vecs - 3]
    qids = [q for q in qids if q < n_vecs]
    lat_ivf, lat_lsh, lat_pq, recall, recall_pq = [], [], [], [], []
    for qid in qids:
        t0 = time.time()
        got = [r["vec_id"] for r in ix.ivf_topk(qid, k=10).collect()]
        lat_ivf.append(time.time() - t0)
        t0 = time.time()
        ix.lsh_topk(qid, k=10).collect()
        lat_lsh.append(time.time() - t0)
        t0 = time.time()
        # refine=64: a 640-row exact rerank is noise next to the code
        # scan, and it recovers most of the IVF-recall ceiling (refine=16
        # measured 0.72 at 1M vectors vs the 0.90 ceiling)
        got_pq = [
            r["vec_id"] for r in ix.pq_topk(qid, k=10, refine=64).collect()
        ]
        lat_pq.append(time.time() - t0)
        qvec = ix._query_vec(qid)
        truth = [
            r["vec_id"]
            for r in rerank_topk(
                emb, qvec, 10, id_col="vec_id", vec_col="embedding"
            ).collect()
        ]
        recall.append(len(set(got) & set(truth)) / 10.0)
        recall_pq.append(len(set(got_pq) & set(truth)) / 10.0)
    emb.unpersist()

    def med(xs):
        return round(sorted(xs)[len(xs) // 2], 4)

    return {
        "n_vectors": n_vecs,
        "train_seconds": round(train_s, 2),
        "build_seconds": round(build_s, 2),
        "vectors_per_sec": round(n_vecs / build_s, 1),
        "pq_build_seconds": round(pq_build_s, 2),
        "ivf_probe_median_s": med(lat_ivf),
        "lsh_probe_median_s": med(lat_lsh),
        "pq_probe_median_s": med(lat_pq),
        "recall_at_10": round(sum(recall) / len(recall), 3),
        "pq_recall_at_10": round(sum(recall_pq) / len(recall_pq), 3),
        "n_queries": len(qids),
    }


def main():
    # `store <n_docs> [cores]` runs ONLY the MinHashStore arm (the 10M-doc
    # store-scale evidence — verdict r4 #7 — without paying the banding
    # growth points or the ANN build at that size)
    args = list(sys.argv[1:])
    store_only = bool(args) and args[0] == "store"
    if store_only:
        args = args[1:]
    n_docs = int(args[0]) if args else 1_000_000
    n_vecs = int(args[1]) if len(args) > 1 else (0 if store_only
                                                else 1_000_000)
    cores = int(args[2]) if len(args) > 2 else (os.cpu_count() or 8)
    if n_docs >= 5_000_000:
        # the robustness-arm lesson (robustness_arm.py docstring): the
        # default 8g local-mode heap OOMs holding a ≥10M-doc corpus
        # persist; partitions silently recompute inside the timed build
        os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    from bench import _fresh_spark, _warm_workers

    spark = _fresh_spark(cores, f"dedup-ann-{n_docs}")
    _warm_workers(spark, cores)

    result: dict = {"cores": cores}
    if store_only:
        work = f"/tmp/dedup_store_arm_{os.getpid()}"
        try:
            result["store"] = _store_arm(spark, n_docs, work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        print("DEDUP_ANN_RESULT " + json.dumps(result))
        spark.stop()
        return
    if n_docs:
        # Heaps'-law-ish vocabulary for the corpus size (a 10k shared
        # vocab at 1M docs is unrealistically overlapping and would
        # charge the banding join for corpus artifacts); SAME vocab at
        # both points so the exponent isolates the join's growth
        vocab = max(50_000, n_docs // 5)
        lo = _dedup_point(spark, n_docs // 4, vocab)
        hi = _dedup_point(spark, n_docs, vocab)
        result["dedup"] = {
            "lo": lo,
            "hi": hi,
            # ≈1.0 = linear candidate growth (the sub-quadratic claim);
            # an O(n²) all-pairs join would show ≈2.0
            "growth_exponent_minhash": _growth(lo, hi, "minhash_candidates"),
            "growth_exponent_simhash": _growth(lo, hi, "simhash_pairs"),
            "candidates_per_doc_hi": round(
                hi["minhash_candidates"] / hi["n_docs"], 3
            ),
        }
    if n_docs:
        work = f"/tmp/dedup_store_arm_{os.getpid()}"
        try:
            result["store"] = _store_arm(spark, n_docs, work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    if n_vecs:
        work = f"/tmp/dedup_ann_arm_{os.getpid()}"
        try:
            result["ann"] = _ann_arm(spark, n_vecs, work)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print("DEDUP_ANN_RESULT " + json.dumps(result))
    spark.stop()


def _store_arm(spark, n_docs: int, work_dir: str) -> dict:
    """MinHashStore at n_docs corpus docs: build-once cost, then probe a
    10k-doc ingest batch (re-keyed one-token-edit dups of corpus docs —
    every batch doc SHOULD match its source) — the streaming-ingest
    near-dup gate's scale numbers. Corpus-side probe work must be
    bounded by the batch, so probe seconds ≈ batch hashing + pruned
    bucket reads, corpus-size-independent."""
    from pyspark.sql import functions as F

    from montezuma_spark.fixtures import synth_corpus_spark
    from montezuma_spark.neardup_store import MinHashStore

    vocab = max(50_000, n_docs // 5)
    docs = synth_corpus_spark(spark, n_docs, vocab_size=vocab,
                              dup_every=None)
    toks = docs.select(
        F.substring("url", -12, 12).cast("long").alias("docid"),
        F.split("text", " ").alias("toks"),
    ).persist()
    toks.count()
    t0 = time.time()
    store = MinHashStore.build(
        spark, toks, f"{work_dir}/store",
        num_hashes=MINHASH_HASHES, band_rows=MINHASH_BAND_ROWS,
    )
    build_s = time.time() - t0
    n_batch = min(10_000, n_docs)  # the recall/throughput denominator
    # re-key by n_docs, not a fixed constant: a fixed +10M offset
    # collides with real corpus docids once n_docs > 10M, and the
    # probe's corpus_id != batch_id guard would silently drop genuine
    # pairs (the store's docid-uniqueness contract)
    batch = toks.filter(F.col("docid") < n_batch).select(
        (F.col("docid") + F.lit(int(n_docs))).alias("docid"),
        F.expr("slice(toks, 2, size(toks))").alias("toks"),
    )
    t0 = time.time()
    pairs = store.near_dups(batch, threshold=0.5).persist()
    n_pairs = pairs.count()
    probe_s = time.time() - t0
    matched = pairs.select("batch_id").distinct().count()
    pairs.unpersist()
    toks.unpersist()
    return {
        "n_corpus": n_docs,
        "n_batch": n_batch,
        "build_seconds": round(build_s, 2),
        "docs_per_sec_build": round(n_docs / build_s, 1),
        "probe_seconds": round(probe_s, 2),
        "batch_docs_per_sec_probe": round(n_batch / probe_s, 1),
        "pairs_found": n_pairs,
        "batch_docs_matched": matched,
        "probe_recall": round(matched / n_batch, 4),
    }


if __name__ == "__main__":
    main()
