#!/usr/bin/env python
"""Run __spark_entry__ queries() against oracle_sql() via DuckDB — the same
comparison the driver performs (row count + column names + order-insensitive
value hash). Usage:

    python scripts/check_oracle.py [--sf /root/testdata/sf0.01] [--query NAME]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def value_hash(df) -> str:
    """Order-insensitive: sort columns by name, sort rows, hash reprs."""
    import pandas as pd

    pdf = df[sorted(df.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--query", default=None)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = [args.query] if args.query else list(qs)
    failures = 0
    for name in names:
        spark_pdf = qs[name](spark, args.sf).toPandas()
        if name not in oracles:
            print(f"{name:32s} rows={len(spark_pdf):7d}  (rows-only check: "
                  f"{'OK' if len(spark_pdf) >= 0 else '??'})")
            continue
        duck_pdf = con.execute(oracles[name]).df()
        ok_rows = len(spark_pdf) == len(duck_pdf)
        ok_cols = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
        hs, hd = value_hash(spark_pdf), value_hash(duck_pdf)
        ok = ok_rows and ok_cols and hs == hd
        failures += (not ok)
        print(f"{name:32s} rows {len(spark_pdf):7d}/{len(duck_pdf):<7d} "
              f"cols={'OK' if ok_cols else sorted(spark_pdf.columns)} "
              f"hash {hs}/{hd} -> {'MATCH' if ok else 'MISMATCH'}")
        if not ok and args.query:
            print("spark:\n", spark_pdf.sort_values(list(sorted(spark_pdf.columns))).head(20))
            print("duck:\n", duck_pdf.sort_values(list(sorted(duck_pdf.columns))).head(20))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
