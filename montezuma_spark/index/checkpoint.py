"""Per-partition checkpointing + lineage for the tokenize stage.

The reference's commit protocol is an atomic ``segments.new`` → ``segments``
rename (src/index/segment-infos.lisp:144-157). Here each input partition
commits its tokenized output independently with the same tmp+rename idiom:

    <dir>/data/pid=<n>/part.parquet        (payload, written via tmp+rename)
    <dir>/_manifest/pid=<n>.json           (lineage: counts, bytes, millis)

A re-run with ``resume=True`` skips any partition whose manifest entry
exists — the driver-visible build report aggregates the lineage records
(docs/sec, tokens/sec, bytes — the metrics the north star requires).

This runs *inside* ``mapInPandas`` so a lost executor re-runs only its own
partitions; a restarted job re-runs only unfinished ones.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from montezuma_spark.index.config import FieldConfig

MANIFEST_SCHEMA = "pid int, n_docs long, n_rows long, n_tokens long, bytes long, millis long, skipped boolean"


def _manifest_path(outdir: str, pid: int) -> str:
    return os.path.join(outdir, "_manifest", f"pid={pid}.json")


def _data_path(outdir: str, pid: int) -> str:
    # flat file names (not hive-style pid=N dirs): the pid column is already
    # in the payload, and spark.read.parquet must not re-derive it
    return os.path.join(outdir, "data", f"part-{pid:05d}.parquet")


def checkpointed_tokenize(
    spark: SparkSession,
    ranged: DataFrame,
    fields: list[FieldConfig],
    max_len: int,
    outdir: str,
    resume: bool,
) -> tuple[DataFrame, dict]:
    """Tokenize ``ranged`` (must carry a constant ``pid`` column per
    partition) writing per-partition parquet + manifest; returns the
    tokenized DataFrame (read back from parquet) and a lineage report."""
    from montezuma_spark.index.builder import _tokenize_iter

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
        parts: list[pd.DataFrame] = []
        pid = None
        for out in _peek_pid_and_skip(batches, outdir):
            if isinstance(out, int):
                pid = out  # sentinel: partition already done
                yield _manifest_row(pid, 0, 0, 0, 0, 0, True)
                return
            parts.append(out)
        if not parts:
            return
        pid = int(parts[0]["pid"].iloc[0])
        pdf_all = pd.concat(parts, ignore_index=True)
        toks = pd.concat(
            list(_tokenize_iter(iter([pdf_all]), fields, max_len)),
            ignore_index=True,
        )
        table = pa.Table.from_pandas(toks, preserve_index=False)
        path = _data_path(outdir, pid)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)  # atomic commit of the payload
        nbytes = os.path.getsize(path)
        millis = int((time.time() - t0) * 1000)
        man = {
            "pid": pid,
            "n_docs": int(pdf_all["key"].nunique()),
            "n_rows": len(toks),
            "n_tokens": int(toks["dl"].sum()),
            "bytes": nbytes,
            "millis": millis,
        }
        mpath = _manifest_path(outdir, pid)
        with open(mpath + ".tmp", "w") as fh:
            json.dump(man, fh)
        os.replace(mpath + ".tmp", mpath)  # manifest commit AFTER payload
        yield _manifest_row(pid, man["n_docs"], man["n_rows"], man["n_tokens"],
                            nbytes, millis, False)

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
    report = {
        "tokenize_partitions": len(records),
        "tokenize_skipped": len(skipped),
        "tokenize_docs": sum(r["n_docs"] for r in done),
        "tokenize_tokens": sum(r["n_tokens"] for r in done),
        "tokenize_bytes": sum(r["bytes"] for r in done),
        "tokenize_millis": sum(r["millis"] for r in done),
    }
    tokenized = spark.read.parquet(os.path.join(outdir, "data"))
    return tokenized, report


def _manifest_row(pid, n_docs, n_rows, n_tokens, nbytes, millis, skipped):
    return pd.DataFrame(
        {
            "pid": [pid],
            "n_docs": [n_docs],
            "n_rows": [n_rows],
            "n_tokens": [n_tokens],
            "bytes": [nbytes],
            "millis": [millis],
            "skipped": [skipped],
        }
    )
