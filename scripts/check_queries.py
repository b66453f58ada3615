"""Local stand-in for the driver's correctness gate: run each Spark query
and its DuckDB oracle at sf0.01, compare row count + column names +
order-insensitive values. Usage: python scripts/check_queries.py [names...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from crawler_core_spark.plans.queries import ORACLE_SQL, QUERIES
from crawler_core_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def main(names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    for name in names or QUERIES:
        fn = QUERIES[name]
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"[SPARK-ERR] {name}: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in ORACLE_SQL:
            print(f"[ROWS-ONLY] {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            continue
        try:
            odf = con.execute(ORACLE_SQL[name]).df()
        except Exception as e:
            print(f"[SQL-ERR]  {name}: {str(e)[:300]}")
            failures += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"[COLS]     {name}: spark={scols} oracle={ocols}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"[COUNT]    {name}: spark={len(sdf)} oracle={len(odf)}")
            failures += 1
            continue
        svals = sorted(
            tuple(str(norm(v)) for v in row) for row in sdf[scols].itertuples(index=False)
        )
        ovals = sorted(
            tuple(str(norm(v)) for v in row) for row in odf[ocols].itertuples(index=False)
        )
        if svals != ovals:
            diff = [(a, b) for a, b in zip(svals, ovals) if a != b][:5]
            print(f"[VALUES]   {name}: {len([1 for a,b in zip(svals,ovals) if a!=b])} mismatched rows; first: {diff}")
            failures += 1
        else:
            print(f"[OK]       {name}: {len(sdf)} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
