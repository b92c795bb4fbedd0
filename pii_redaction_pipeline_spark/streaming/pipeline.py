"""Structured Streaming variant of the scrub pipeline.

The reference is strictly batch (SURVEY §2.9); this is the Spark-native
upgrade path: the same stage functions (all stateless row-local
transformations) compose unchanged over readStream. Checkpointing is
Spark's own WAL — complementary to the batch bucket-lineage resume in
sources/tableio.py.

Also provides the watermarked tumbling-window aggregation over an events
stream (late-data tolerant metrics feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import PipelineConfig, apply_pipeline
from ..schema import CLIPS_SCHEMA


def scrub_stream(spark: SparkSession, source_dir: str, out_dir: str,
                 checkpoint_dir: str, cfg: PipelineConfig | None = None):
    """File-source stream of clips parquet → scrub pipeline → parquet sink.
    Trigger availableNow processes the backlog exactly once and stops —
    the streaming twin of a batch catch-up run."""
    cfg = cfg or PipelineConfig(with_audio_verify=False, with_ppl=False)
    stream = (spark.readStream.schema(CLIPS_SCHEMA)
              .option("maxFilesPerTrigger", 8)
              .parquet(source_dir))
    out = apply_pipeline(stream, cfg).drop("redactions")
    return (out.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def events_windowed_stream(events: DataFrame, watermark: str = "2 minutes",
                           window: str = "1 minute") -> DataFrame:
    """Watermarked tumbling-window counts per event_type (streaming agg
    with bounded state; late rows beyond the watermark are dropped)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))
