"""Physical-plan assertions: the shapes that matter at 100 TB must be in
the plan, not just hoped for (SURVEY §4.2)."""

import pytest
from pyspark.sql import functions as F

from pii_redaction_pipeline_spark.queries import (
    q_pricing_summary,
    q_quality_flags,
    q_top_suppliers,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_top_suppliers_broadcasts_dims(spark):
    plan = plan_of(q_top_suppliers(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_pricing_summary_partial_agg_and_pushdown(spark):
    plan = plan_of(q_pricing_summary(spark, SF))
    assert "HashAggregate" in plan
    # filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan \
        or "LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(q_quality_flags(spark, SF))
    # quality flags touch only doc_id + text → scan must not read the rest
    read_schema = plan.split("ReadSchema:")[-1]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema and "source" not in read_schema


def test_scrub_pipeline_python_stages_fused(spark, tmp_path):
    """Quality/langid/grade stay JVM-side (WholeStageCodegen over the
    parquet scan); Catalyst fuses the scrub and ppl pandas UDFs into a
    single ArrowEvalPython stage — one Python round trip total."""
    from pii_redaction_pipeline_spark import datagen
    from pii_redaction_pipeline_spark.pipeline import PipelineConfig, apply_pipeline

    src = str(tmp_path / "clips")
    datagen.clips_df(spark, 10, seed=1, partitions=1,
                     with_audio=False).write.parquet(src)
    clips = spark.read.parquet(src)
    out = apply_pipeline(clips, PipelineConfig(with_audio_verify=False))
    plan = plan_of(out)
    # WholeStageCodegen renders as "*(n)" stage prefixes in plan strings
    assert "*(" in plan
    assert plan.count("ArrowEvalPython") == 1  # scrub + ppl fused
