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

* ``bands/gen=<g>/band_id=<k>/`` — (docid long, band_val string),
  band_val RANGE-SORTED within 2 MB-row-group files. Hive directories
  for band_id (a handful) and for the GENERATION that wrote the rows;
  never ``partitionBy(band_val)`` — the AnnIndex-bands rule:
  value-level directories cap band width and force fat buckets at
  scale. (``gen`` is segment bookkeeping, not value partitioning: the
  log-tier merge policy bounds the generation count, exactly like
  index segments.) A probe pushes the batch's band values as an
  equality/IN predicate, so parquet min/max row-group stats prune the
  read to the touched buckets within every generation.
* ``shingles/gen=<g>/`` — (docid long, sh array<long>)
  docid-range-sorted, 4 MB row groups: the verify sidecar. ``sh``
  holds the HASHED distinct 3-gram shingles (md5-low32 mod 2³¹−1 — the
  same ``hm`` universe the affine signatures minimize over), so verify
  Jaccard is exact over the signature's own feature space; it differs
  from string-level Jaccard only on md5 collisions (~dl²/2³² per pair
  — negligible), and costs 8 B per shingle instead of storing text
  twice.
* ``meta.json`` — num_hashes / band_rows / ngram + the COMMITTED
  generation list (id, docs, bands rows per generation). The meta file
  is the store's atomic commit point (written tmp-then-``os.replace``,
  the segments-file protocol from ``streaming/incremental.py``):
  readers touch only generations the meta lists, so a crash mid-append
  or mid-merge leaves at worst an orphan directory that ``load()``
  garbage-collects — never a half-visible or half-deleted table.

Each ``add_batch`` writes one new generation (the incremental-segment
pattern); the range sort holds WITHIN each generation's files, so probe
pruning degrades with the generation count rather than breaking.
``maybe_merge`` (run automatically after ``add_batch`` when
``min_merge_docs`` is set — the default) re-compacts runs of small
generations in log tiers exactly like the index writer's
maybe-merge-segments walk, so long-running ingest pays O(log N)
rewrites per doc; ``compact()`` is the all-generations ``optimize``
analog.

Docids must be unique across the corpus and every probed/added batch
(the ingest pipeline's docid assignment — e.g. ``queries.rank_docids``
offsets or the IncrementalIndexer's docid bases — owns that).

Scale shape of a probe: batch-side hashing is O(batch), and NOTHING
about the probe shuffles corpus-sized data — the band read is either
value-pruned (small batches: literal IN pushdown hits row-group stats)
or a shuffle-free broadcast-bucket pass, and the verify join BROADCASTS
the batch-bounded candidate pairs against the shingle sidecar (a
sort-merge plan here shuffles the whole corpus sidecar: measured 59.5 s
vs ~10 s at 10M docs / 10k-doc batch). A large batch's scattered band
values defeat min/max pruning by construction (every 2 MB row group of
a sorted 40M-row table contains some probed value), so the big-batch
floor is one sequential columnar pass per table at scan bandwidth —
linear in corpus bytes but embarrassingly parallel and shuffle-free.
On a truly huge corpus, amortize that pass by accumulating deltas into
larger probe batches (probe cost is flat in batch size until the
candidate cap), exactly like the batch-serving tier amortizes its scan.
Nothing is quadratic.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montezuma_spark.dedup import (
    _shingles_expr,
    band_values,
    feature_hash,
    minhash_signature_from_hashes,
)

# band-value pushdown gate: below this many DISTINCT (band_id, band_val)
# values the batch's values ride the corpus scan as literal predicates
# (row-group pruning); above it, a broadcast join (still bucket-equi,
# just unpruned)
PUSHDOWN_MAX_VALUES = 20_000
# candidate-pair broadcast gate: candidates are batch-bounded (~batch ×
# dup multiplicity), so the verify join broadcasts them against the
# shingle sidecar — a shuffle-free scan instead of sort-merge-shuffling
# the corpus-sized shingle table (measured 59.5 s vs ~8 s at 10M docs /
# 10k batch). The cap guards the pathological template-batch case where
# band buckets fan out; above it the plain join's shuffle is the safer
# plan.
CAND_BROADCAST_MAX = 2_000_000


def _count_rows(spark, path: str) -> int:
    """Row count of a just-written parquet dir (footer-level scan); 0
    when the write produced no data files (empty frame → only
    _SUCCESS, which fails schema inference)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path).count()
    except AnalysisException:
        return 0


class MinHashStore:
    def __init__(self, spark, store_dir: str, meta: dict):
        self.spark = spark
        self.store_dir = store_dir
        self.meta = meta
        self.num_hashes = meta["num_hashes"]
        self.band_rows = meta["band_rows"]
        self.ngram = meta["ngram"]
        # log-tier merge policy (mirrors IncrementalIndexer): after each
        # add_batch, runs of >= merge_factor-worth of generations below a
        # size tier are merged; min_merge_docs=None disables auto-merge
        self.merge_factor: int = 10
        self.min_merge_docs: int | None = 100_000
        self.max_merge_docs: int = 1 << 31
        self._refresh()

    # ----------------------------------------------------------- table reads
    def _refresh(self) -> None:
        """(Re)bind self.bands / self.shingles to the COMMITTED
        generations. Only a store whose committed generations hold zero
        rows falls back to an empty frame (an all-short-docs corpus
        writes no band rows; an empty corpus writes no shingle rows) —
        a missing or unreadable directory for a committed non-empty
        generation RAISES: silently matching nothing would admit every
        near-dup through dedup_gate (the silent-under-dedup rule)."""
        gens = self.meta["gens"]
        band_gens = [g["id"] for g in gens if g["bands"] > 0]
        doc_gens = [g["id"] for g in gens if g["docs"] > 0]
        # every committed non-empty generation directory must EXIST —
        # parquet partition discovery would silently match fewer rows if
        # one went missing (partial restore, stray cleanup), and a
        # store that under-matches admits near-dups through dedup_gate
        for name, ids in (("bands", band_gens), ("shingles", doc_gens)):
            for gid in ids:
                d = f"{self.store_dir}/{name}/gen={gid}"
                if not os.path.isdir(d):
                    raise FileNotFoundError(
                        f"committed generation missing: {d}"
                    )
        if band_gens:
            self.bands = (
                self.spark.read.parquet(f"{self.store_dir}/bands")
                .filter(F.col("gen").isin(band_gens))
                .drop("gen")
            )
        else:
            self.bands = self.spark.createDataFrame(
                [], "docid long, band_val string, band_id int"
            )
        if doc_gens:
            self.shingles = (
                self.spark.read.parquet(f"{self.store_dir}/shingles")
                .filter(F.col("gen").isin(doc_gens))
                .drop("gen")
            )
        else:
            self.shingles = self.spark.createDataFrame(
                [], "docid long, sh array<long>"
            )

    def _commit_meta(self) -> None:
        tmp = f"{self.store_dir}/meta.json.tmp"
        with open(tmp, "w") as fh:
            json.dump(self.meta, fh, indent=2)
        os.replace(tmp, f"{self.store_dir}/meta.json")

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
        """Persist the corpus's band postings + shingle sidecar as
        generation 0. Defaults are the web-scale parameters the 1M-doc
        arm validated (r=6 keeps random band collisions sub-quadratic)."""
        sh, bands = MinHashStore._prep(
            docs_toks, ngram, num_hashes, band_rows, id_col, toks_col
        )
        os.makedirs(store_dir, exist_ok=True)
        entry = MinHashStore._write_generation(
            spark, store_dir, 0, bands, sh, num_hashes, band_rows
        )
        meta = {"num_hashes": num_hashes, "band_rows": band_rows,
                "ngram": ngram, "gens": [entry], "next_gen": 1}
        st = MinHashStore(spark, store_dir, meta)
        st._commit_meta()
        return st

    @staticmethod
    def _write_generation(spark, store_dir: str, gen_id: int,
                          bands: DataFrame, sh: DataFrame,
                          num_hashes: int, band_rows: int) -> dict:
        """Write one generation's band + shingle dirs; returns its meta
        entry (NOT yet committed — the caller owns the meta commit, so
        a crash here leaves only an invisible orphan directory)."""
        bdir = f"{store_dir}/bands/gen={gen_id}"
        sdir = f"{store_dir}/shingles/gen={gen_id}"
        MinHashStore._write_bands(bands, bdir, num_hashes, band_rows)
        MinHashStore._write_shingles(sh, sdir)
        return {"id": gen_id, "docs": _count_rows(spark, sdir),
                "bands": _count_rows(spark, bdir)}

    @staticmethod
    def _write_bands(bands: DataFrame, out_dir: str, num_hashes: int,
                     band_rows: int):
        # file count follows parallelism (a cluster deployment would size
        # by rows/file like AnnIndex.BANDS_ROWS_PER_FILE); the layout
        # rule that matters for probes is the range sort + 2 MB groups
        nbands = max(1, num_hashes // band_rows)
        spark = bands.sparkSession
        files = max(nbands, spark.sparkContext.defaultParallelism)
        (
            bands.repartitionByRange(files, "band_id", "band_val")
            .sortWithinPartitions("band_id", "band_val")
            .write.mode("overwrite")
            .partitionBy("band_id")
            .option("parquet.block.size", str(2 * 1024 * 1024))
            .parquet(out_dir)
        )

    @staticmethod
    def _write_shingles(sh: DataFrame, out_dir: str):
        spark = sh.sparkSession
        n = spark.sparkContext.defaultParallelism
        (
            sh.repartitionByRange(n, "docid")
            .sortWithinPartitions("docid")
            .write.mode("overwrite")
            .option("parquet.block.size", str(4 * 1024 * 1024))
            .parquet(out_dir)
        )

    @staticmethod
    def load(spark, store_dir: str) -> "MinHashStore":
        with open(f"{store_dir}/meta.json") as fh:
            meta = json.load(fh)
        if "gens" not in meta:
            meta = MinHashStore._migrate_legacy(spark, store_dir, meta)
        st = MinHashStore(spark, store_dir, meta)
        st._gc_orphans()
        return st

    @staticmethod
    def _migrate_legacy(spark, store_dir: str, meta: dict) -> dict:
        """One-time upgrade of a pre-generation store (flat
        ``bands/band_id=…`` + ``shingles/``): move both tables under
        ``gen=0`` (directory renames — no data rewrite) and commit the
        generation list. Idempotent across crashes: each table's move
        goes through a staging dir, and a partially-moved table is
        finished before the meta commit."""
        for name in ("bands", "shingles"):
            live = f"{store_dir}/{name}"
            stage = f"{store_dir}/.migrate_{name}"
            if os.path.isdir(f"{stage}/gen=0") and not os.path.isdir(live):
                os.rename(stage, live)      # crashed between the renames
            elif os.path.isdir(live) and not os.path.isdir(f"{live}/gen=0"):
                os.makedirs(stage, exist_ok=True)
                os.rename(live, f"{stage}/gen=0")
                os.rename(stage, live)
        entry = {
            "id": 0,
            "docs": _count_rows(spark, f"{store_dir}/shingles/gen=0"),
            "bands": _count_rows(spark, f"{store_dir}/bands/gen=0"),
            # legacy files may be per-batch appends whose range sort
            # holds only within each old batch — compact() must treat
            # this generation as rewrite-needed even when it is alone
            "migrated": True,
        }
        meta = dict(meta)
        meta["gens"] = [entry]
        meta["next_gen"] = 1
        tmp = f"{store_dir}/meta.json.tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh, indent=2)
        os.replace(tmp, f"{store_dir}/meta.json")
        return meta

    def _gc_orphans(self) -> None:
        """Delete generation dirs the meta does not list — leftovers of
        a crash after a write but before its meta commit (invisible to
        reads either way; this just reclaims the space)."""
        live = {g["id"] for g in self.meta["gens"]}
        for name in ("bands", "shingles"):
            root = f"{self.store_dir}/{name}"
            if not os.path.isdir(root):
                continue
            for d in os.listdir(root):
                if d.startswith("gen="):
                    try:
                        gid = int(d[4:])
                    except ValueError:
                        continue
                    if gid not in live:
                        shutil.rmtree(f"{root}/{d}", ignore_errors=True)

    # ------------------------------------------------------------ ingest
    def _batch_prep(self, batch_toks: DataFrame, id_col: str,
                    toks_col: str):
        return MinHashStore._prep(
            batch_toks, self.ngram, self.num_hashes, self.band_rows,
            id_col, toks_col,
        )

    def add_batch(self, batch_toks: DataFrame, id_col: str = "docid",
                  toks_col: str = "toks") -> None:
        """Append a committed batch as a new generation, then run the
        log-tier merge walk (when ``min_merge_docs`` is set, the
        default) so long-running ingest keeps a bounded generation
        count — probes stay range-pruned without manual ``compact()``
        calls."""
        sh, bands = self._batch_prep(batch_toks, id_col, toks_col)
        gid = self.meta["next_gen"]
        entry = MinHashStore._write_generation(
            self.spark, self.store_dir, gid, bands, sh,
            self.num_hashes, self.band_rows,
        )
        if entry["docs"] == 0 and entry["bands"] == 0:
            # empty delta: never commit a zero generation — repeated
            # empty batches would grow the generation list unboundedly
            # (zero-doc runs can never satisfy a merge tier target)
            shutil.rmtree(f"{self.store_dir}/bands/gen={gid}",
                          ignore_errors=True)
            shutil.rmtree(f"{self.store_dir}/shingles/gen={gid}",
                          ignore_errors=True)
            return
        self.meta["gens"].append(entry)
        self.meta["next_gen"] = gid + 1
        self._commit_meta()
        self._refresh()
        if self.min_merge_docs is not None:
            self.maybe_merge()

    # ----------------------------------------------------- tiered merge
    def maybe_merge(self) -> list:
        """The index writer's log-tier merge walk applied to store
        generations (``maybe_merge`` in ``streaming/incremental.py``;
        maybe-merge-segments in the reference, index-writer.lisp:184-199):
        for each size tier ``target`` = min_merge_docs × merge_factor^k,
        find the newest run of generations each smaller than ``target``;
        if the run totals ≥ ``target`` docs, merge it into one
        generation. Repeated small batches therefore compact in O(log N)
        tiers — never the all-at-once rewrite of ``compact()``. Returns
        the meta entries of any generations created."""
        if self.min_merge_docs is None:
            return []
        made = []
        target = self.min_merge_docs
        while target <= self.max_merge_docs:
            gens = self.meta["gens"]
            lo = len(gens)
            merge_docs = 0
            while lo > 0 and gens[lo - 1]["docs"] < target:
                merge_docs += gens[lo - 1]["docs"]
                lo -= 1
            if merge_docs >= target and len(gens) - lo >= 2:
                made.append(self._merge_generations(lo))
            else:
                return made
            target *= self.merge_factor
        return made

    def _merge_generations(self, lo: int) -> dict:
        """Merge generations[lo:] into one new generation, restoring the
        global range sort across the merged rows. Crash-safe by the meta
        protocol: the new generation's dirs are fully written BEFORE the
        meta commit swaps it in; the replaced generations' dirs are
        deleted only AFTER (a crash in between leaves orphans that
        ``load()`` garbage-collects)."""
        run = self.meta["gens"][lo:]
        ids = [g["id"] for g in run]
        b = (
            self.spark.read.parquet(f"{self.store_dir}/bands")
            .filter(F.col("gen").isin([g["id"] for g in run
                                       if g["bands"] > 0]))
            .drop("gen")
            if any(g["bands"] > 0 for g in run)
            else self.spark.createDataFrame(
                [], "docid long, band_val string, band_id int")
        )
        s = (
            self.spark.read.parquet(f"{self.store_dir}/shingles")
            .filter(F.col("gen").isin([g["id"] for g in run
                                       if g["docs"] > 0]))
            .drop("gen")
            if any(g["docs"] > 0 for g in run)
            else self.spark.createDataFrame(
                [], "docid long, sh array<long>")
        )
        gid = self.meta["next_gen"]
        entry = MinHashStore._write_generation(
            self.spark, self.store_dir, gid, b, s,
            self.num_hashes, self.band_rows,
        )
        self.meta["gens"] = self.meta["gens"][:lo] + [entry]
        self.meta["next_gen"] = gid + 1
        self._commit_meta()
        for old in ids:
            shutil.rmtree(f"{self.store_dir}/bands/gen={old}",
                          ignore_errors=True)
            shutil.rmtree(f"{self.store_dir}/shingles/gen={old}",
                          ignore_errors=True)
        self._refresh()
        return entry

    def compact(self) -> None:
        """Merge ALL generations into one — the store's ``optimize``
        analog, restoring single-generation range pruning regardless of
        tier state. Same crash-safe commit as the tiered merge: the old
        generations stay live (and readable) until the meta commit, and
        their directories are deleted only after it."""
        gens = self.meta["gens"]
        if len(gens) >= 2 or (gens and gens[0].get("migrated")):
            # a lone generation written by _write_generation is already
            # globally range-sorted (nothing to do), but a MIGRATED
            # legacy generation holds the old per-batch append files
            # whose sort held only within each batch — rewrite it
            self._merge_generations(0)
        else:
            self._refresh()

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
        # the gate counts DISTINCT (band_id, band_val) values — what the
        # predicate actually inlines — via a limit-bounded collect (one
        # job, no oversized collect when the batch is above the gate)
        dvals = b_bands.select("band_id", "band_val").distinct()
        rows = dvals.limit(pushdown_max_values + 1).collect()
        if len(rows) <= pushdown_max_values:
            # literal pushdown: band_val strings are digits+':' only
            # (affine-family ints), safe to inline in ONE expr — the
            # searcher._terms_predicate lesson: never one py4j
            # round-trip per literal
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
            corpus_bands = self.bands.join(F.broadcast(dvals),
                                           ["band_id", "band_val"])
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
        # pin the candidate pairs (one bands pass total: the count below
        # and the verify join both reuse the checkpointed rows), then
        # broadcast them into the shingle join — the verify becomes a
        # single shuffle-free pass over the docid-sorted sidecar, never
        # a sort-merge shuffle of the corpus-sized table
        cand = cand.localCheckpoint()
        if cand.count() <= CAND_BROADCAST_MAX:
            cand = F.broadcast(cand)
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
