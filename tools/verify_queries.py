"""Local mirror of the driver's correctness harness: run every
__spark_entry__.queries() entry and its oracle_sql() on the same sf dir,
compare row counts + order-insensitive values. Usage:

    python tools/verify_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # procedural (VALUES) oracles must replicate over the SAME sf dir the
    # Spark queries read; set before the entry import builds them
    import os

    os.environ["ETLPY_ORACLE_SF_DIR"] = sf_dir
    import __spark_entry__ as entry
    from etlpy_spark.session import get_spark

    spark = get_spark(app_name="verify-queries", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failed, passed, weak = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:
            failed.append((name, f"spark error: {type(e).__name__}: {e}"))
            continue
        sql = oracles.get(name)
        if sql is None:
            weak.append((name, len(got)))
            continue
        try:
            exp = normalize(con.execute(sql).df())
        except Exception as e:
            failed.append((name, f"oracle error: {e}"))
            continue
        if list(got.columns) != list(exp.columns):
            failed.append((name, f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"))
            continue
        if len(got) != len(exp):
            failed.append((name, f"row count: spark={len(got)} oracle={len(exp)}"))
            continue
        exp = exp.astype(got.dtypes.to_dict(), errors="ignore")
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, rtol=1e-6, atol=1e-9)
            passed.append(name)
        except AssertionError as e:
            failed.append((name, f"values differ: {str(e).splitlines()[-1][:300]}"))

    print(f"\nPASS {len(passed)}: {' '.join(passed)}")
    for name, n in weak:
        print(f"WEAK (rows-only) {name}: {n} rows")
    for name, msg in failed:
        print(f"FAIL {name}: {msg}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
