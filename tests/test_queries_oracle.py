"""Every oracled query in plans/queries.py vs its DuckDB SQL at sf0.001 —
the in-repo mirror of the driver's CORRECTNESS gate (row count + column
names + order-insensitive values)."""

import math

import duckdb
import pytest

from crawler_core_spark.plans.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else str(round(v, 6))
    return str(v)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.execute(ORACLE_SQL[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    cols = sorted(sdf.columns)
    svals = sorted(tuple(norm(v) for v in r) for r in sdf[cols].itertuples(index=False))
    ovals = sorted(tuple(norm(v) for v in r) for r in odf[cols].itertuples(index=False))
    assert svals == ovals


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
