#!/usr/bin/env python
"""spark-submit entry point: build the inverted index over a parquet table
of web pages and report lineage metrics.

Cluster usage (the north-star packaging; local[] used in this sandbox):

    python tools/make_pyfiles.py                       # → dist/montezuma_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/montezuma_spark.zip \
        tools/submit_build.py \
        --input /data/web_pages --index-dir /data/index \
        [--analyzer simple] [--resume] [--query "field:term ..."]

The driver script only imports from the shipped zip, so executors resolve
``montezuma_spark`` from --py-files exactly as on a real cluster. Emits ONE
JSON line with the build report (docs/sec, postings/sec, bytes) and, with
--query, the top-10 results as proof the index answers queries.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input", required=True,
        help="web-pages source: parquet path or Iceberg/catalog table name",
    )
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--key-col", default="url")
    ap.add_argument("--analyzer", default="simple")
    ap.add_argument("--shard-bits", type=int, default=20)
    ap.add_argument("--similarity", default="bm25",
                    help="scoring fn: bm25 | classic | registered name")
    ap.add_argument("--boost-col", default=None,
                    help="numeric column baked in as per-doc boost")
    ap.add_argument("--offsets", action="store_true",
                    help="write the char-offsets term-vectors sidecar")
    ap.add_argument("--extract-html", action="store_true",
                    help="derive the text column from the html binary "
                         "column via the deterministic extractor (also "
                         "implied when --text-col is absent from the "
                         "input but 'html' exists)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--query", default=None)
    ap.add_argument("--query-file", default=None,
                    help="text file of parsed queries (one per line): the "
                         "whole log is answered as ONE distributed job "
                         "(Searcher.search_batch) and reported as qps")
    args = ap.parse_args()

    # on spark-submit the session already exists; getOrCreate attaches
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()

    from montezuma_spark.index import FieldConfig, IndexConfig, build_index

    cfg = IndexConfig(
        fields=[
            FieldConfig("text", args.text_col, args.analyzer,
                        offsets=args.offsets)
        ],
        key_col=args.key_col,
        shard_bits=args.shard_bits,
        similarity=args.similarity,
        boost_col=args.boost_col,
    )
    from montezuma_spark.sources import extract_text, read_table

    t0 = time.time()
    docs = read_table(spark, args.input)
    extracted = args.extract_html or (
        args.text_col not in docs.columns and "html" in docs.columns
    )
    if extracted:
        # html → text as JVM-side column expressions inside the same scan:
        # no extra pass, no Python worker, byte-deterministic per url.
        docs = extract_text(docs, html_col="html", out_col=args.text_col)
    idx = build_index(
        spark, docs, cfg, index_dir=args.index_dir, resume=args.resume
    )
    wall = time.time() - t0
    rep = dict(idx.build_report)
    rep["wall_seconds"] = round(wall, 3)
    st = idx.stats.get("text", {})
    if wall > 0 and st:
        rep["docs_per_sec"] = round(st.get("num_docs", 0) / wall, 2)
        rep["tokens_per_sec"] = round(st.get("total_tokens", 0) / wall, 1)
    rep["extracted_html"] = bool(extracted)
    out = {"build": rep, "stats": idx.stats}

    if args.query:
        from montezuma_spark.search import Searcher
        from montezuma_spark.search.parser import QueryParser

        q = QueryParser(default_field="text", analyzer=args.analyzer).parse(
            args.query
        )
        t0 = time.time()
        hits = Searcher(idx).top_docs(q, k=10)
        out["query"] = {
            "q": args.query,
            "latency_sec": round(time.time() - t0, 4),
            "top10": [[int(d), round(s, 6)] for d, s in hits],
        }

    if args.query_file:
        from montezuma_spark.search import Searcher
        from montezuma_spark.search.parser import QueryParser

        parser = QueryParser(default_field="text", analyzer=args.analyzer)
        with open(args.query_file) as fh:
            lines = [ln.strip() for ln in fh if ln.strip()]
        batch = {f"q{i:04d}": parser.parse(ln) for i, ln in enumerate(lines)}
        t0 = time.time()
        n_rows = Searcher(idx, distributed=True).search_batch(
            batch, k=10
        ).count()
        dt = time.time() - t0
        out["query_log"] = {
            "n_queries": len(batch),
            "result_rows": int(n_rows),
            "total_sec": round(dt, 4),
            "qps": round(len(batch) / dt, 1) if dt > 0 else None,
        }

    print("SUBMIT_BUILD_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
