"""Per-partition checkpointing + lineage for the fused segment-build stage.

The reference's commit protocol is an atomic ``segments.new`` → ``segments``
rename (src/index/segment-infos.lisp:144-157). Here each input partition
commits its fully-encoded segment cells independently with the same
tmp+rename idiom:

    <dir>/data/part-<pid>.parquet          (payload, written via tmp+rename)
    <dir>/_manifest/pid=<n>.json           (lineage: counts, bytes, millis)

A re-run with ``resume=True`` skips any partition whose manifest entry
exists — the driver-visible build report aggregates the lineage records
(docs/sec, postings/sec, bytes compressed — the metrics the north star
requires).

This runs *inside* ``mapInPandas`` so a lost executor re-runs only its own
partitions; a restarted job re-runs only unfinished ones.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

MANIFEST_SCHEMA = (
    "pid int, n_docs long, n_cells long, n_postings long, n_tokens long, "
    "bytes long, millis long, skipped boolean"
)


def _manifest_path(outdir: str, pid: int) -> str:
    return os.path.join(outdir, "_manifest", f"pid={pid}.json")


def _data_path(outdir: str, pid: int) -> str:
    # flat file names (not hive-style pid=N dirs): spark.read.parquet must
    # not re-derive partition columns
    return os.path.join(outdir, "data", f"part-{pid:05d}.parquet")


def checkpointed_segments(
    spark: SparkSession,
    ranged: DataFrame,
    segment_fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    outdir: str,
    resume: bool,
) -> tuple[DataFrame, dict]:
    """Run the fused segment builder over ``ranged`` (must carry a constant
    ``pid`` column per partition), committing each partition's cell output
    as parquet + a lineage manifest; returns the cells DataFrame (read back
    from parquet) and the aggregated lineage report."""
    from montezuma_spark.index.builder import MARKER_TERMS, STATS_TERM

    os.makedirs(os.path.join(outdir, "_manifest"), exist_ok=True)
    os.makedirs(os.path.join(outdir, "data"), exist_ok=True)
    if not resume:
        # clear stale manifests AND payloads so a fresh build rewrites
        # everything (partition counts may have changed)
        for sub in ("_manifest", "data"):
            d = os.path.join(outdir, sub)
            for f in os.listdir(d):
                os.unlink(os.path.join(d, f))

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.time()
        raw = []
        pid = None
        skipped = False
        for out in _peek_pid_and_skip(batches, outdir):
            if isinstance(out, int):
                pid = out
                skipped = True
                break
            raw.append(out)
        if skipped:
            yield _manifest_row(pid, 0, 0, 0, 0, 0, 0, True)
            return
        if not raw:
            return
        pid = int(raw[0]["pid"].iloc[0])
        cells = pd.concat(
            list(segment_fn(iter(raw))), ignore_index=True
        ) if raw else pd.DataFrame()
        table = pa.Table.from_pandas(cells, preserve_index=False)
        path = _data_path(outdir, pid)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)  # atomic commit of the payload
        nbytes = os.path.getsize(path)
        millis = int((time.time() - t0) * 1000)
        stats = cells[cells["term"] == STATS_TERM]
        real = cells[~cells["term"].isin(MARKER_TERMS)]
        man = {
            "pid": pid,
            # stats markers are per field — docs counted once, not per field
            "n_docs": int(stats["df"].max()) if len(stats) else 0,
            "n_cells": int(len(real)),
            "n_postings": int(real["df"].sum()),
            "n_tokens": int(stats["cf"].sum()),
            "bytes": nbytes,
            "millis": millis,
        }
        mpath = _manifest_path(outdir, pid)
        with open(mpath + ".tmp", "w") as fh:
            json.dump(man, fh)
        os.replace(mpath + ".tmp", mpath)  # manifest commit AFTER payload
        yield _manifest_row(
            pid, man["n_docs"], man["n_cells"], man["n_postings"],
            man["n_tokens"], nbytes, millis, False,
        )

    def _peek_pid_and_skip(batches, outdir):
        first = True
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if first:
                first = False
                pid = int(pdf["pid"].iloc[0])
                if os.path.exists(_manifest_path(outdir, pid)):
                    yield pid  # already committed → skip all work
                    return
            yield pdf

    manifest_df = ranged.mapInPandas(work, schema=MANIFEST_SCHEMA)
    records = [r.asDict() for r in manifest_df.collect()]
    done = [r for r in records if not r["skipped"]]
    skipped = [r for r in records if r["skipped"]]
    built_millis = sum(r["millis"] for r in done) or 1
    report = {
        "segment_partitions": len(records),
        "segment_skipped": len(skipped),
        "segment_docs": sum(r["n_docs"] for r in done),
        "segment_cells": sum(r["n_cells"] for r in done),
        "segment_postings": sum(r["n_postings"] for r in done),
        "segment_tokens": sum(r["n_tokens"] for r in done),
        "segment_bytes": sum(r["bytes"] for r in done),
        "segment_millis": built_millis,
        # per-partition-summed rates (CPU-seconds basis, parallelism-free)
        "segment_docs_per_cpu_sec": round(
            sum(r["n_docs"] for r in done) / (built_millis / 1000.0), 1
        ),
        "segment_postings_per_cpu_sec": round(
            sum(r["n_postings"] for r in done) / (built_millis / 1000.0), 1
        ),
    }
    cells = spark.read.parquet(os.path.join(outdir, "data"))
    return cells, report


def _manifest_row(pid, n_docs, n_cells, n_postings, n_tokens, nbytes,
                  millis, skipped):
    return pd.DataFrame(
        {
            "pid": [pid],
            "n_docs": [n_docs],
            "n_cells": [n_cells],
            "n_postings": [n_postings],
            "n_tokens": [n_tokens],
            "bytes": [nbytes],
            "millis": [millis],
            "skipped": [skipped],
        }
    )
