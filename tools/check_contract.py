"""Driver-style correctness harness: run each queries() entry on Spark and
its oracle_sql() on DuckDB over the same parquet; compare row count, schema,
and order-insensitive values (sorted columns, like the driver does)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None):
    import os

    # data-dependent oracle entries (trained IVF centroids) must template
    # the matrix for THIS sf, not the driver's default sf0.01
    os.environ["MONTEZUMA_ORACLE_SF_DIR"] = sf_dir

    from montezuma_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("documents", "embeddings", "region", "nation", "customer",
              "supplier", "part", "orders", "lineitem", "events"):
        try:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.IOException:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"{name:24s} SPARK-ERROR {e}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows={len(got)} (no oracle — rows-only)")
            continue
        try:
            want = normalize(con.sql(oracles[name]).df())
        except Exception as e:
            failures.append((name, f"ORACLE ERROR {e}"))
            print(f"{name:24s} ORACLE-ERROR {e}")
            continue
        ok_rows = len(got) == len(want)
        ok_schema = list(got.columns) == list(want.columns)
        ok_vals = ok_rows and ok_schema and got.equals(want)
        if not ok_vals and ok_rows and ok_schema:
            # find first mismatch for debugging
            neq = (got != want) & ~(got.isna() & want.isna())
            bad = neq.any(axis=1)
            detail = (
                f"first diff:\n{got[bad].head(3)}\nvs\n{want[bad].head(3)}"
                if bad.any()
                else "dtype diff: "
                + str([(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns])
            )
        else:
            detail = f"got cols={list(got.columns)} want cols={list(want.columns)}"
        status = "OK" if ok_vals else "MISMATCH"
        print(f"{name:24s} {status} rows={len(got)}/{len(want)}")
        if not ok_vals:
            failures.append((name, detail))
            print(detail)
    # entry smoke
    if not only:
        edf = entrymod.entry(spark)
        rows = edf.collect()
        print(f"entry() rows={len(rows)} schema={edf.schema.simpleString()}")
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nALL OK")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    main(sf, only)
