"""Tombstone deletions + merge-time compaction (expunge).

Reference parity: ``delete-document`` / ``delete-docs-with-term`` /
``undelete-all`` (src/index/index-reader.lisp:129-153), the per-segment
``.del`` bitset (src/util/bit-vector.lisp:5-31,
src/index/segment-reader.lisp:106-119), and merge-time compaction via
``doc-map`` (src/index/segment-merge-info.lisp:27-40).

Spark-first design:

* Tombstones live as a small sorted docid array on the ``Index``
  (persisted as ``deletions.json`` next to the index). At query time the
  array ships inside the serialized ``CompiledPlan`` — i.e. a broadcast —
  and every shard kernel masks deleted docids at posting-decode time,
  BEFORE any top-k truncation (``ShardEval._drop_deleted``), exactly like
  the reference's enumerator-level deleted-doc skip
  (src/index/term-doc-enum.lisp:85-98).
* Like the reference, df / idf / avgdl statistics are NOT updated by
  deletes; they refresh at ``expunge_deletes`` (the reference refreshes
  them at segment merge). Docids stay stable across expunge (we do not
  renumber like merge-fields does, segment-merger.lisp:94-123 — stable
  docids keep the url→docid goldens valid; the holes cost nothing in a
  delta-varint encoding).
* Scale note (10^12 docs): a delete set too large to broadcast becomes a
  tombstone TABLE anti-joined against doc_lens/results; ``expunge_deletes``
  is the compaction that keeps the broadcast small — the same role the
  reference's logarithmic merge plays for its ``.del`` files.

``expunge_deletes`` is one narrow ``mapInPandas`` over the postings table
(no shuffle): cells whose docid range contains no tombstone pass through
byte-identical without decoding; affected cells are decoded, masked, and
re-encoded. Block-max metadata is avgdl-free (maxtf/mindl), so the
rewritten bounds are exact for the surviving postings.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from montezuma_spark.codec.postings import decode_cell, decode_positions

DELETIONS_FILE = "deletions.json"


def load_tombstones(index_dir: str | None) -> np.ndarray:
    if index_dir:
        path = os.path.join(index_dir, DELETIONS_FILE)
        if os.path.exists(path):
            with open(path) as fh:
                return np.asarray(sorted(json.load(fh)), dtype=np.int64)
    return np.empty(0, dtype=np.int64)


def save_tombstones(index_dir: str, tombstones: np.ndarray) -> None:
    path = os.path.join(index_dir, DELETIONS_FILE)
    tmp = path + ".new"
    with open(tmp, "w") as fh:
        json.dump([int(d) for d in tombstones], fh)
    # atomic rename — the segments.new → segments commit idiom
    # (src/index/segment-infos.lisp:144-157)
    os.replace(tmp, path)


# expunge holes sidecar: docids permanently removed by expunge (docids are
# stable-with-holes — builder.Index.holes). A separate file, NOT meta.json
# or the streaming manifest: holes only grow, and riding a per-commit JSON
# document would cost O(holes) parse+rewrite on every micro-batch.
HOLES_FILE = "holes.json"


def load_holes(index_dir: str | None) -> np.ndarray:
    if index_dir:
        path = os.path.join(index_dir, HOLES_FILE)
        if os.path.exists(path):
            with open(path) as fh:
                return np.asarray(sorted(json.load(fh)), dtype=np.int64)
    return np.empty(0, dtype=np.int64)


def save_holes(index_dir: str, holes: np.ndarray) -> None:
    path = os.path.join(index_dir, HOLES_FILE)
    tmp = path + ".new"
    with open(tmp, "w") as fh:
        json.dump([int(d) for d in holes], fh)
    os.replace(tmp, path)


def _rewrite_iter(
    batches: Iterator[pd.DataFrame],
    deleted: np.ndarray,
    block_size: int,
    codec: str = "varint",
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: drop tombstoned postings, re-encode touched cells.

    Works uniformly on real postings cells AND doclens marker cells (their
    tf stream is dl+1, which survives masking unchanged)."""
    from montezuma_spark.index.builder import (
        POSTINGS_COLS,
        _cell_row,
        row_meta,
    )

    for pdf in batches:
        if len(pdf) == 0:
            continue
        out_rows = []
        for row in pdf.itertuples(index=False):
            blk_first = np.asarray(row.blk_first, dtype=np.int64)
            blk_last = np.asarray(row.blk_last, dtype=np.int64)
            if len(blk_first) == 0:
                continue
            # fast path: no tombstone inside this cell's docid range
            lo = np.searchsorted(deleted, blk_first[0], side="left")
            if lo >= len(deleted) or deleted[lo] > blk_last[-1]:
                out_rows.append(row._asdict())
                continue
            meta = row_meta(row)
            docids, tfs, dls = decode_cell(
                bytes(row.postings), meta, codec=codec
            )
            idx = np.clip(
                np.searchsorted(deleted, docids), 0, len(deleted) - 1
            )
            keep = deleted[idx] != docids
            if keep.all():
                out_rows.append(row._asdict())
                continue
            if not keep.any():
                continue  # whole posting list gone
            pos_lists = None
            if bytes(row.positions):
                # reassemble per-posting position lists, mask
                nblocks = len(meta["n"])
                bounds = np.concatenate(
                    [[0], np.cumsum(np.asarray(meta["n"], dtype=np.int64))]
                )
                block_tfs = {
                    j: tfs[bounds[j] : bounds[j + 1]] for j in range(nblocks)
                }
                pos_by_block = decode_positions(
                    bytes(row.positions), list(row.pos_off), meta, block_tfs,
                    codec=codec,
                )
                flat_all = (
                    np.concatenate([pos_by_block[j] for j in range(nblocks)])
                    if nblocks
                    else np.empty(0, dtype=np.int64)
                )
                pb = np.concatenate([[0], np.cumsum(tfs)])
                pos_lists = [
                    flat_all[pb[i] : pb[i + 1]]
                    for i in np.flatnonzero(keep)
                ]
            out_rows.append(
                _cell_row(
                    row.field, row.term, row.shard, docids[keep], tfs[keep],
                    dls[keep], pos_lists, block_size, codec,
                )
            )
        if out_rows:
            yield pd.DataFrame(out_rows, columns=POSTINGS_COLS)


def expunge_deletes(index) -> "object":
    """Compact tombstones out of the index → new ``Index`` (stats refreshed,
    tombstone set cleared). The segment-merge analog for deletes
    (src/index/segment-merger.lisp:94-123), minus docid renumbering."""
    from montezuma_spark.index.builder import POSTINGS_SCHEMA, Index

    deleted = index.tombstones
    if len(deleted) == 0:
        return index
    spark = index.spark
    del_df = spark.createDataFrame(
        [(int(d),) for d in deleted], "docid long"
    )
    doc_lens = index.doc_lens.join(
        F.broadcast(del_df), "docid", "left_anti"
    )
    doc_map = index.doc_map.join(F.broadcast(del_df), "docid", "left_anti")
    stats_rows = (
        doc_lens.groupBy("field")
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
    # docids are NOT renumbered (stable with holes) — the docid universe
    # stays at the pre-expunge bound while the corpus doc count drops to
    # the live count. Pre-key layouts have no exact bound in stats; the
    # original doc_map's max docid + 1 recovers it exactly (it still
    # holds every live docid, and holes only exist below prior bounds)
    from montezuma_spark.codec.postings import CORPUS_STATS_KEY

    md = index.stats.get(CORPUS_STATS_KEY, {}).get("max_doc")
    if not md:
        row = index.doc_map.agg(F.max("docid")).collect()[0]
        hi = int(row[0]) + 1 if row[0] is not None else 0
        md = max(hi, int(index.holes.max()) + 1 if len(index.holes) else 0)
    stats[CORPUS_STATS_KEY] = {
        "num_docs": int(index.num_docs()),
        "max_doc": int(md),
        "avgdl": 0.0, "total_tokens": 0,
    }
    cfg = index.config
    postings = index.postings.mapInPandas(
        lambda it: _rewrite_iter(
            it, deleted, cfg.block_size, cfg.block_codec
        ),
        schema=POSTINGS_SCHEMA,
    )
    from montezuma_spark.index.builder import BOOST_TERM

    term_stats = postings.filter(F.col("term") != BOOST_TERM).groupBy(
        "field", "term"
    ).agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    tv_offsets = (
        index.tv_offsets.join(F.broadcast(del_df), "docid", "left_anti")
        if index.tv_offsets is not None
        else None
    )
    new = Index(
        spark, cfg, doc_map, doc_lens, postings, term_stats, stats,
        index_dir=None, build_report=dict(index.build_report),
        tv_offsets=tv_offsets,
    )
    # expunged docids become permanent HOLES: docids are never renumbered
    # or reused, so docid-level queries (DocIdSetQuery) must keep masking
    # them even though the postings no longer contain them
    new.holes = np.union1d(index.tombstones, index.holes)
    if index.index_dir:
        out_dir = index.index_dir + ".expunge"
        new = new.save(out_dir)  # persists holes via meta.json
        save_tombstones(out_dir, np.empty(0, dtype=np.int64))
    return new
