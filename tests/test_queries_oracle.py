"""Mini-driver: run every registry query on Spark AND its DuckDB oracle at
sf0.001, compare row count, column names, and order-insensitive values —
the same comparison shape the real driver applies at sf0.01."""

import math
import os

import duckdb
import pytest

from pii_redaction_pipeline_spark.queries import QUERIES

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(rows, columns):
    """Sort columns by name, canonicalize values, sort rows."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, bool):
                v = bool(v)
            elif isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    ddf = duck.execute(sql)
    dcols = [d[0] for d in ddf.description]
    drows = ddf.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    a = normalize([[r[c] for c in scols] for r in srows], scols)
    b = normalize(drows, dcols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, f"{name}: {len(mism)} value mismatches, first: " \
                     f"{a[mism[0]]!r} vs {b[mism[0]]!r}"
