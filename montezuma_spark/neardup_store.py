"""Persisted MinHash band store — STREAMING near-dup detection.

The text analog of ``AnnIndex``: signatures and band postings for the
whole corpus are computed at BUILD time and persisted; an incoming
ingest batch probes them without recomputing any corpus state. This is
the missing piece between batch dedup (``dedup.py`` /
``pipeline.prepare_corpus``, which compare a corpus against itself) and
streaming ingestion (``streaming/incremental.py``): a nightly crawl
delta must be checked against the 10¹²-doc corpus, not just against
itself.

Layout (``{dir}/``):

* ``bands/band_id=<k>/`` — (docid long, band_val string), band_val
  RANGE-SORTED within 2 MB-row-group files. Hive directories only for
  band_id (a handful); never ``partitionBy(band_val)`` — the
  AnnIndex-bands rule: value-level directories cap band width and force
  fat buckets at scale. A probe pushes the batch's band values as an
  equality/IN predicate, so parquet min/max row-group stats prune the
  read to the touched buckets.
* ``shingles/`` — (docid long, sh array<long>) docid-range-sorted, 4 MB
  row groups: the verify sidecar. ``sh`` holds the HASHED distinct
  3-gram shingles (md5-low32 mod 2³¹−1 — the same ``hm`` universe the
  affine signatures minimize over), so verify Jaccard is exact over the
  signature's own feature space; it differs from string-level Jaccard
  only on md5 collisions (~dl²/2³² per pair — negligible), and costs
  8 B per shingle instead of storing text twice.
* ``meta.json`` — num_hashes / band_rows / ngram.

Docids must be unique across the corpus and every probed/added batch
(the ingest pipeline's docid assignment — e.g. ``queries.rank_docids``
offsets or the IncrementalIndexer's docid bases — owns that).

Scale shape of a probe: batch-side hashing is O(batch); the corpus-side
read is bucket-pruned to the batch's band values; the verify join
touches only candidate corpus docs' shingle rows. Nothing rescans the
corpus, nothing is quadratic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montezuma_spark.dedup import (
    _shingles_expr,
    band_values,
    feature_hash,
    minhash_signature_from_hashes,
)

# band-value pushdown gate: below this many (band_id, band_val) rows the
# batch's values ride the corpus scan as literal predicates (row-group
# pruning); above it, a broadcast join (still bucket-equi, just unpruned)
PUSHDOWN_MAX_VALUES = 20_000


class MinHashStore:
    def __init__(self, spark, store_dir: str, meta: dict):
        self.spark = spark
        self.store_dir = store_dir
        self.meta = meta
        self.num_hashes = meta["num_hashes"]
        self.band_rows = meta["band_rows"]
        self.ngram = meta["ngram"]
        # an all-short-docs corpus writes ZERO band/shingle files (only
        # _SUCCESS) — fall back to empty frames with the layout schema
        # instead of failing schema inference; such a store matches
        # nothing, which is correct
        try:
            self.bands = spark.read.parquet(f"{store_dir}/bands")
        except Exception:
            self.bands = spark.createDataFrame(
                [], "docid long, band_val string, band_id int"
            )
        try:
            self.shingles = spark.read.parquet(f"{store_dir}/shingles")
        except Exception:
            self.shingles = spark.createDataFrame(
                [], "docid long, sh array<long>"
            )

    # ------------------------------------------------------------ build
    @staticmethod
    def _prep(docs_toks: DataFrame, ngram: int, num_hashes: int,
              band_rows: int, id_col: str, toks_col: str):
        """(shingle-hash arrays, signature, band rows) for a doc set —
        the one hashing pass shared by build, add_batch and probes."""
        sh = (
            docs_toks.select(
                F.col(id_col).alias("docid"),
                F.explode(F.expr(_shingles_expr(toks_col, ngram)))
                .alias("_g"),
            )
            .select("docid", feature_hash(F.col("_g")).alias("_hm"))
            .groupBy("docid")
            .agg(F.array_sort(F.collect_set("_hm")).alias("sh"))
        )
        # empty-shingle docs (len < ngram) keep a row so they are
        # registered (they can never near-dup anything)
        empties = docs_toks.select(
            F.col(id_col).alias("docid")
        ).join(sh.select("docid"), "docid", "left_anti").select(
            "docid", F.array().cast("array<long>").alias("sh")
        )
        sh = sh.union(empties)
        sig = minhash_signature_from_hashes(
            sh.select("docid", F.explode("sh").alias("_hm")),
            num_hashes, id_col="docid", hm_col="_hm",
        )
        bands = band_values(sig, num_hashes, band_rows, id_col="docid")
        return sh, bands

    @staticmethod
    def build(spark, docs_toks: DataFrame, store_dir: str, *,
              num_hashes: int = 24, band_rows: int = 6, ngram: int = 3,
              id_col: str = "docid",
              toks_col: str = "toks") -> "MinHashStore":
        """Persist the corpus's band postings + shingle sidecar.
        Defaults are the web-scale parameters the 1M-doc arm validated
        (r=6 keeps random band collisions sub-quadratic)."""
        sh, bands = MinHashStore._prep(
            docs_toks, ngram, num_hashes, band_rows, id_col, toks_col
        )
        os.makedirs(store_dir, exist_ok=True)
        MinHashStore._write_bands(
            bands, f"{store_dir}/bands", num_hashes, band_rows
        )
        MinHashStore._write_shingles(sh, f"{store_dir}/shingles")
        meta = {"num_hashes": num_hashes, "band_rows": band_rows,
                "ngram": ngram}
        with open(f"{store_dir}/meta.json", "w") as fh:
            json.dump(meta, fh, indent=2)
        return MinHashStore(spark, store_dir, meta)

    @staticmethod
    def _write_bands(bands: DataFrame, out_dir: str, num_hashes: int,
                     band_rows: int, mode: str = "overwrite"):
        # file count follows parallelism (a cluster deployment would size
        # by rows/file like AnnIndex.BANDS_ROWS_PER_FILE); the layout
        # rule that matters for probes is the range sort + 2 MB groups
        nbands = max(1, num_hashes // band_rows)
        spark = bands.sparkSession
        files = max(nbands, spark.sparkContext.defaultParallelism)
        (
            bands.repartitionByRange(files, "band_id", "band_val")
            .sortWithinPartitions("band_id", "band_val")
            .write.mode(mode)
            .partitionBy("band_id")
            .option("parquet.block.size", str(2 * 1024 * 1024))
            .parquet(out_dir)
        )

    @staticmethod
    def _write_shingles(sh: DataFrame, out_dir: str,
                        mode: str = "overwrite"):
        spark = sh.sparkSession
        n = spark.sparkContext.defaultParallelism
        (
            sh.repartitionByRange(n, "docid")
            .sortWithinPartitions("docid")
            .write.mode(mode)
            .option("parquet.block.size", str(4 * 1024 * 1024))
            .parquet(out_dir)
        )

    @staticmethod
    def load(spark, store_dir: str) -> "MinHashStore":
        with open(f"{store_dir}/meta.json") as fh:
            meta = json.load(fh)
        return MinHashStore(spark, store_dir, meta)

    # ------------------------------------------------------------ ingest
    def _batch_prep(self, batch_toks: DataFrame, id_col: str,
                    toks_col: str):
        return MinHashStore._prep(
            batch_toks, self.ngram, self.num_hashes, self.band_rows,
            id_col, toks_col,
        )

    def add_batch(self, batch_toks: DataFrame, id_col: str = "docid",
                  toks_col: str = "toks") -> None:
        """Append a committed batch's band postings + shingles — new
        files per batch (the incremental-segment pattern); the range
        sort holds within each batch's files, so probe pruning degrades
        to per-batch-file granularity rather than breaking."""
        sh, bands = self._batch_prep(batch_toks, id_col, toks_col)
        MinHashStore._write_bands(
            bands, f"{self.store_dir}/bands", self.num_hashes,
            self.band_rows, mode="append",
        )
        MinHashStore._write_shingles(
            sh, f"{self.store_dir}/shingles", mode="append"
        )
        self.bands = self.spark.read.parquet(f"{self.store_dir}/bands")
        self.shingles = self.spark.read.parquet(
            f"{self.store_dir}/shingles"
        )

    def compact(self) -> None:
        """Rewrite both tables globally range-sorted — the store's
        ``optimize`` analog. Append-heavy stores accumulate per-batch
        file generations whose range sort holds only WITHIN each batch,
        so a probe's min/max pruning degrades to per-generation
        granularity; one compaction restores one-file-per-range pruning.
        Writes to sibling dirs then swaps, so a crash mid-compact leaves
        the old generations readable."""
        import shutil

        tmpb = f"{self.store_dir}/bands.compact"
        tmps = f"{self.store_dir}/shingles.compact"
        MinHashStore._write_bands(
            self.bands, tmpb, self.num_hashes, self.band_rows
        )
        MinHashStore._write_shingles(self.shingles, tmps)
        shutil.rmtree(f"{self.store_dir}/bands")
        os.rename(tmpb, f"{self.store_dir}/bands")
        shutil.rmtree(f"{self.store_dir}/shingles")
        os.rename(tmps, f"{self.store_dir}/shingles")
        self.bands = self.spark.read.parquet(f"{self.store_dir}/bands")
        self.shingles = self.spark.read.parquet(
            f"{self.store_dir}/shingles"
        )

    # ------------------------------------------------------------- probe
    def near_dups(self, batch_toks: DataFrame, threshold: float = 0.8,
                  id_col: str = "docid", toks_col: str = "toks",
                  pushdown_max_values: int = PUSHDOWN_MAX_VALUES
                  ) -> DataFrame:
        """(batch_id, corpus_id, jaccard ≥ threshold): the incoming
        batch vs the ENTIRE persisted corpus. Corpus work is bounded by
        the batch: band buckets are read via pushed-down value
        predicates (small batches) or a broadcast bucket join; verify
        reads only candidate docs' shingle rows."""
        # ONE hashing pass per probe: both frames are referenced several
        # times by the returned plan (candidate join, verify join), so
        # pin their ROWS with localCheckpoint — a persist released after
        # the internal count would recompute the md5/groupBy stages at
        # the caller's materialization
        b_sh, b_bands = self._batch_prep(batch_toks, id_col, toks_col)
        b_sh = b_sh.localCheckpoint()
        b_bands = b_bands.localCheckpoint()
        nvals = b_bands.count()
        if nvals <= pushdown_max_values:
            # literal pushdown: band_val strings are digits+':' only
            # (affine-family ints), safe to inline in ONE expr — the
            # searcher._terms_predicate lesson: never one py4j
            # round-trip per literal
            rows = b_bands.select("band_id", "band_val").distinct() \
                .collect()
            by_band: dict = {}
            for r in rows:
                by_band.setdefault(int(r["band_id"]), []).append(
                    r["band_val"]
                )
            parts = [
                "(band_id = {} AND band_val IN ({}))".format(
                    k, ", ".join(f"'{v}'" for v in vs)
                )
                for k, vs in sorted(by_band.items())
            ]
            corpus_bands = self.bands.filter(
                F.expr(" OR ".join(parts)) if parts else F.lit(False)
            )
        else:
            corpus_bands = self.bands.join(
                F.broadcast(
                    b_bands.select("band_id", "band_val").distinct()
                ),
                ["band_id", "band_val"],
            )
        cand = (
            corpus_bands.select(
                "band_id", "band_val",
                F.col("docid").alias("corpus_id"),
            )
            .join(
                F.broadcast(
                    b_bands.select(
                        "band_id", "band_val",
                        F.col("docid").alias("batch_id"),
                    )
                ),
                ["band_id", "band_val"],
            )
            .filter(F.col("corpus_id") != F.col("batch_id"))
            .select("batch_id", "corpus_id")
            .distinct()
        )
        j = (
            cand.join(
                self.shingles.select(
                    F.col("docid").alias("corpus_id"),
                    F.col("sh").alias("sh_a"),
                ),
                "corpus_id",
            )
            .join(
                F.broadcast(
                    b_sh.select(
                        F.col("docid").alias("batch_id"),
                        F.col("sh").alias("sh_b"),
                    )
                ),
                "batch_id",
            )
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.greatest(
                    F.size(F.array_union("sh_a", "sh_b")), F.lit(1)
                ),
            )
        )
        return j.filter(F.col("jaccard") >= threshold).select(
            "batch_id", "corpus_id", "jaccard"
        )

    def dedup_gate(self, batch_docs: DataFrame, threshold: float = 0.8,
                   id_col: str = "docid",
                   toks_col: str = "toks") -> DataFrame:
        """Rows of ``batch_docs`` that are NOT near-dups of the corpus —
        the ingest filter in front of ``IncrementalIndexer.add_batch``.
        Intra-batch dups are ``pipeline.prepare_corpus``'s job; run it
        on the batch first when deltas can self-duplicate."""
        dups = self.near_dups(
            batch_docs, threshold, id_col, toks_col
        ).select(F.col("batch_id").alias(id_col)).distinct()
        return batch_docs.join(dups, id_col, "left_anti")
