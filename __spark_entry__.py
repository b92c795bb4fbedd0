"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship detect→scrub→grade pipeline over a clips-shaped
table derived from sf0.001 documents (BASELINE.json input_hint shape).

queries()/oracle_sql(): one entry per implemented operator family from
SURVEY.md §2 — the Spark implementation and its DuckDB oracle SQL.
Queries without SQL-expressible semantics (fuzzy matching, WER DP) omit
the oracle; their row-level correctness is enforced by the pytest oracle
(tests/test_spark_pipeline.py against pii_redaction_pipeline_spark.core).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pii_redaction_pipeline_spark.queries import QUERIES, q_pipeline_full


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pipeline_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
