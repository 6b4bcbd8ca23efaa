"""Inverted-index construction, Spark-first.

Pipeline (exactly ONE wide shuffle on (field, term, shard) plus the docid
range-partition — Spark's sort-merge replaces the reference's segment-merge
priority queue, src/index/segment-merger.lisp:163-246):

1. ``repartitionByRange(key)`` + ``sortWithinPartitions(key)`` — one Spark
   partition == one reference "segment" (src/index/index-writer.lisp:71-91),
   but holding many docs.
2. ``mapInPandas`` tokenize: vectorized analysis chain → rows
   (pid, key, field, dl, terms[]). Optionally checkpointed per partition
   (resume skips completed partitions — see checkpoint.py).
3. Deterministic docid assignment: docid = global rank of ``key`` =
   per-partition dense_rank + exclusive prefix sum of partition key counts.
   No global single-partition window — scales to any doc count. (Replaces
   the reference's segment-base rebasing, src/index/multi-reader.lisp:30-37.)
4. ``mapInPandas`` inversion: terms[] → (field, term, shard, docid, tf, dl,
   positions[]) — the invert-document analog
   (src/index/document-writer.lisp:51-142), all numpy.
5. ``groupBy(field, term, shard).applyInPandas`` encode: docID-delta varint
   cells + block-max metadata + positions sidecar (the .frq/.prx writer,
   src/index/document-writer.lisp:153-213). Sharding by docid range bounds
   every group at 2^shard_bits docs — hot terms (skew) split structurally
   across shards instead of hitting one reducer.
6. term_stats dictionary = groupBy(field, term) rollup of shard df/cf
   (cross-segment df sum analog, src/index/multi-reader.lisp:151-153).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from montezuma_spark.analysis import get_analyzer
from montezuma_spark.codec.postings import encode_cell, encode_positions
from montezuma_spark.index.config import FieldConfig, IndexConfig

TOKENIZED_SCHEMA = (
    "pid int, key string, field string, dl long, terms array<string>"
)

INVERTED_SCHEMA = (
    "field string, term string, shard long, docid long, tf long, dl long, "
    "positions array<int>"
)

# terms are hash-bucketed for the encode shuffle: tasks = shards × buckets,
# each bucket encodes many terms in one pandas batch
ENCODE_BUCKETS = 128

POSTINGS_SCHEMA = (
    "field string, term string, shard long, df long, cf long, "
    "postings binary, positions binary, pos_off array<long>, "
    "blk_first array<long>, blk_last array<long>, blk_n array<int>, "
    "blk_off array<long>, blk_codes_len array<long>, blk_ext_len array<long>, "
    "blk_maxw array<float>"
)


def _tokenize_iter(
    batches: Iterator[pd.DataFrame], fields: list[FieldConfig], max_len: int
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: analysis chain over each arrow batch."""
    analyzers = {
        f.name: (get_analyzer(f.analyzer) if f.analyzer else None) for f in fields
    }
    for pdf in batches:
        out = []
        for f in fields:
            an = analyzers[f.name]
            col = pdf[f.column]
            if an is None:
                # untokenized: whole value is a single term
                # (ref: document-writer.lisp:69-75 untokenized branch)
                terms = col.map(
                    lambda v: [v] if isinstance(v, str) and v != "" else []
                )
            else:
                terms = an.tokens_series(col)
            if max_len:
                terms = terms.map(lambda t: t[:max_len])
            out.append(
                pd.DataFrame(
                    {
                        "pid": pdf["pid"].astype("int32"),
                        "key": pdf["key"],
                        "field": f.name,
                        "dl": terms.map(len).astype("int64"),
                        "terms": terms,
                    }
                )
            )
        yield pd.concat(out, ignore_index=True)


def _invert_iter(
    batches: Iterator[pd.DataFrame], shard_bits: int
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (docid, field, terms[]) → posting rows, all numpy."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        n_tokens = pdf["terms"].map(len).to_numpy(dtype=np.int64)
        if n_tokens.sum() == 0:
            continue
        keep = n_tokens > 0
        pdf = pdf[keep]
        n_tokens = n_tokens[keep]
        flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in pdf["terms"]])
        row_idx = np.repeat(np.arange(len(pdf)), n_tokens)
        # token position within its document = local arange per row
        bounds = np.cumsum(n_tokens)
        pos = np.arange(bounds[-1], dtype=np.int64) - np.repeat(
            bounds - n_tokens, n_tokens
        )
        term_codes, term_inv = np.unique(flat_terms, return_inverse=True)
        field_codes, field_inv = np.unique(
            pdf["field"].to_numpy(dtype=object), return_inverse=True
        )
        docids = pdf["docid"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        # sort tokens by (field, docid, term, pos) → contiguous groups
        order = np.lexsort(
            (pos, term_inv, docids[row_idx], field_inv[row_idx])
        )
        r = row_idx[order]
        t = term_inv[order]
        p = pos[order]
        fi = field_inv[r]
        d = docids[r]
        grp_change = np.empty(len(order), dtype=bool)
        grp_change[0] = True
        grp_change[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1]) | (fi[1:] != fi[:-1])
        starts = np.flatnonzero(grp_change)
        tf = np.diff(np.append(starts, len(order)))
        pos_lists = np.split(p, starts[1:])
        out = pd.DataFrame(
            {
                "field": field_codes[fi[starts]],
                "term": term_codes[t[starts]],
                "shard": d[starts] >> shard_bits,
                "docid": d[starts],
                "tf": tf.astype(np.int64),
                "dl": dls[r[starts]],
                "positions": [pl.astype(np.int32) for pl in pos_lists],
            }
        )
        yield out


def _make_encoder(avgdl_by_field: dict, cfg_block: int, k1: float, b: float,
                  store_positions: dict):
    """Encoder for groupBy(field, shard, tbucket) — each group carries MANY
    terms (hash-bucketed), amortizing applyInPandas overhead across a
    bucket instead of paying it per term."""

    def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        field_name = key[0]
        shard = key[1]
        avgdl = avgdl_by_field.get(field_name, 1.0)
        with_pos = store_positions.get(field_name, True)
        terms_arr = pdf["term"].to_numpy(dtype=object)
        docid_arr = pdf["docid"].to_numpy(dtype=np.int64)
        tf_arr = pdf["tf"].to_numpy(dtype=np.int64)
        dl_arr = pdf["dl"].to_numpy(dtype=np.int64)
        term_codes, term_inv = np.unique(terms_arr, return_inverse=True)
        order = np.lexsort((docid_arr, term_inv))
        ti = term_inv[order]
        starts = np.flatnonzero(np.diff(ti, prepend=-1))
        bounds = np.append(starts, len(ti))
        pos_arr = pdf["positions"].to_numpy(dtype=object) if with_pos else None
        out = {c: [] for c in (
            "field", "term", "shard", "df", "cf", "postings", "positions",
            "pos_off", "blk_first", "blk_last", "blk_n", "blk_off",
            "blk_codes_len", "blk_ext_len", "blk_maxw",
        )}
        for gi in range(len(starts)):
            sl = order[bounds[gi] : bounds[gi + 1]]
            docids = docid_arr[sl]
            tfs = tf_arr[sl]
            dls = dl_arr[sl]
            cell, meta = encode_cell(
                docids, tfs, dls=dls, avgdl=avgdl, block_size=cfg_block,
                k1=k1, b=b,
            )
            if with_pos:
                plists = pos_arr[sl]
                flat = (
                    np.concatenate(plists).astype(np.int64)
                    if len(plists)
                    else np.empty(0, dtype=np.int64)
                )
                pos_cell, pos_off = encode_positions(
                    tfs, flat, block_size=cfg_block
                )
            else:
                pos_cell, pos_off = b"", []
            out["field"].append(field_name)
            out["term"].append(term_codes[gi])
            out["shard"].append(shard)
            out["df"].append(len(docids))
            out["cf"].append(int(tfs.sum()))
            out["postings"].append(cell)
            out["positions"].append(pos_cell)
            out["pos_off"].append(np.asarray(pos_off, dtype=np.int64))
            out["blk_first"].append(np.asarray(meta["first"], dtype=np.int64))
            out["blk_last"].append(np.asarray(meta["last"], dtype=np.int64))
            out["blk_n"].append(np.asarray(meta["n"], dtype=np.int32))
            out["blk_off"].append(np.asarray(meta["off"], dtype=np.int64))
            out["blk_codes_len"].append(
                np.asarray(meta["codes_len"], dtype=np.int64)
            )
            out["blk_ext_len"].append(
                np.asarray(meta["ext_len"], dtype=np.int64)
            )
            out["blk_maxw"].append(np.asarray(meta["maxw"], dtype=np.float32))
        return pd.DataFrame(out)

    return encode_group


class Index:
    """A built inverted index: DataFrames + corpus stats + config."""

    def __init__(
        self,
        spark: SparkSession,
        config: IndexConfig,
        doc_map: DataFrame,
        doc_lens: DataFrame,
        postings: DataFrame,
        term_stats: DataFrame,
        stats: dict,
        index_dir: str | None = None,
        build_report: dict | None = None,
    ):
        self.spark = spark
        self.config = config
        self.doc_map = doc_map
        self.doc_lens = doc_lens
        self.postings = postings
        self.term_stats = term_stats
        self.stats = stats  # field -> {"num_docs": int, "avgdl": float, "total_tokens": int}
        self.index_dir = index_dir
        self.build_report = build_report or {}

    # ------------------------------------------------------------------ save
    def save(self, index_dir: str) -> "Index":
        os.makedirs(index_dir, exist_ok=True)
        self.doc_map.write.mode("overwrite").parquet(f"{index_dir}/doc_map")
        self.doc_lens.repartition("field").write.mode("overwrite").parquet(
            f"{index_dir}/doc_lens"
        )
        # range-layout by (field, term) so query-term predicates prune files
        # via parquet min/max — the .tii two-level dictionary analog
        # (src/index/term-infos-io.lisp:19-36)
        self.postings.repartitionByRange("field", "term").sortWithinPartitions(
            "field", "term", "shard"
        ).write.mode("overwrite").parquet(f"{index_dir}/postings")
        self.term_stats.write.mode("overwrite").parquet(f"{index_dir}/term_stats")
        with open(f"{index_dir}/meta.json", "w") as fh:
            json.dump(
                {
                    "config": self.config.to_json(),
                    "stats": self.stats,
                    "build_report": self.build_report,
                },
                fh,
                indent=2,
            )
        return Index.load(self.spark, index_dir)

    @staticmethod
    def load(spark: SparkSession, index_dir: str) -> "Index":
        with open(f"{index_dir}/meta.json") as fh:
            meta = json.load(fh)
        return Index(
            spark,
            IndexConfig.from_json(meta["config"]),
            spark.read.parquet(f"{index_dir}/doc_map"),
            spark.read.parquet(f"{index_dir}/doc_lens"),
            spark.read.parquet(f"{index_dir}/postings"),
            spark.read.parquet(f"{index_dir}/term_stats"),
            meta["stats"],
            index_dir=index_dir,
            build_report=meta.get("build_report", {}),
        )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    config: IndexConfig | None = None,
    index_dir: str | None = None,
    resume: bool = False,
    docid_base: int = 0,
) -> Index:
    """Build the inverted index over ``docs``.

    With ``index_dir`` the tokenize stage is checkpointed per partition and
    ``resume=True`` skips partitions already built (see checkpoint.py).
    """
    config = config or IndexConfig()
    t0 = time.time()
    nparts = config.num_partitions or spark.sparkContext.defaultParallelism
    src_cols = [config.key_col] + sorted(
        {f.column for f in config.fields} | set(config.store_cols)
    )
    ranged = (
        docs.select(F.col(config.key_col).alias("key"),
                    *[c for c in src_cols if c != config.key_col])
        .repartitionByRange(nparts, "key")
        .sortWithinPartitions("key")
        .withColumn("pid", F.spark_partition_id())
    )

    fields = config.fields
    max_len = config.max_field_length
    if index_dir:
        from montezuma_spark.index.checkpoint import checkpointed_tokenize

        tokenized, tok_report = checkpointed_tokenize(
            spark, ranged, fields, max_len, f"{index_dir}/tokenized", resume
        )
    else:
        tokenized = ranged.mapInPandas(
            lambda it: _tokenize_iter(it, fields, max_len),
            schema=TOKENIZED_SCHEMA,
        )
        tokenized = tokenized.persist(StorageLevel.MEMORY_AND_DISK)
        tok_report = {}

    # --- deterministic docid assignment (rank of key in global key order) ---
    pid_counts = (
        tokenized.select("pid", "key")
        .groupBy("pid")
        .agg(F.countDistinct("key").alias("n"))
        .orderBy("pid")
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = docid_base  # segment base for incremental/streaming builds
    for row in pid_counts:
        offsets[row["pid"]] = acc
        acc += row["n"]
    total_docs = acc - docid_base
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "pid int, offset long"
    )
    w = Window.partitionBy("pid").orderBy("key")
    with_docid = (
        tokenized.withColumn("rank", F.dense_rank().over(w))
        .join(F.broadcast(offset_df), "pid")
        .withColumn("docid", F.col("offset") + F.col("rank") - 1)
        .drop("rank", "offset")
    )
    with_docid = with_docid.persist(StorageLevel.MEMORY_AND_DISK)

    doc_map = with_docid.select("docid", "key").distinct()
    if config.store_cols:
        # stored fields (the .fdt/.fdx analog, src/index/fields-io.lisp):
        # keep selected source columns alongside the docid for result
        # hydration and sort-by-stored-field
        stored = ranged.select("key", *config.store_cols)
        doc_map = doc_map.join(stored, "key", "left")
    doc_lens = with_docid.select(
        "field",
        "docid",
        "dl",
        F.shiftright("docid", config.shard_bits).alias("shard"),
    )

    stats_rows = (
        with_docid.groupBy("field")
        .agg(
            F.count("*").alias("num_docs"),
            F.avg("dl").alias("avgdl"),
            F.sum("dl").alias("total_tokens"),
        )
        .collect()
    )
    stats = {
        r["field"]: {
            "num_docs": int(r["num_docs"]),
            "avgdl": float(r["avgdl"] or 0.0),
            "total_tokens": int(r["total_tokens"] or 0),
        }
        for r in stats_rows
    }

    # --- inversion + encode --------------------------------------------------
    inverted = with_docid.select("docid", "field", "dl", "terms").mapInPandas(
        lambda it: _invert_iter(it, config.shard_bits), schema=INVERTED_SCHEMA
    )
    avgdl_by_field = {f: s["avgdl"] for f, s in stats.items()}
    store_positions = {f.name: f.positions for f in config.fields}
    encoder = _make_encoder(
        avgdl_by_field, config.block_size, config.k1, config.b, store_positions
    )
    # hash-bucket terms so each shuffle group encodes MANY posting lists
    # (amortizes per-group pandas overhead); (field, term, shard) rows stay
    # unique because a term maps to exactly one bucket
    postings = (
        inverted.withColumn(
            "tbucket", F.pmod(F.xxhash64("term"), F.lit(ENCODE_BUCKETS))
        )
        .groupBy("field", "shard", "tbucket")
        .applyInPandas(encoder, schema=POSTINGS_SCHEMA)
    )

    term_stats = postings.groupBy("field", "term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    )

    report = {
        "total_docs": total_docs,
        "partitions": nparts,
        "build_seconds": None,  # filled after materialization
        **tok_report,
    }
    idx = Index(
        spark, config, doc_map, doc_lens, postings, term_stats, stats,
        index_dir=index_dir, build_report=report,
    )
    if index_dir:
        idx = idx.save(index_dir)
        idx.build_report["build_seconds"] = time.time() - t0
    return idx
