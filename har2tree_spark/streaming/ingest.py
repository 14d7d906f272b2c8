"""Structured Streaming ingestion.

The reference is strictly batch (SURVEY.md §1.3) — streaming here is the
engine's *extension* for continuous document arrival:

  * ``incremental_pipeline`` — foreachBatch: each micro-batch of new
    documents runs the SAME batch operators (parse -> exact cascade) and
    appends to the output tables; exactly-once via the streaming
    checkpoint + idempotent append per batch id. This is the streaming
    face of the lineage/resume story (operators/lineage.py).
  * ``streaming_tile_counts`` — continuous per-cell feature counts
    (update mode); the array-level parse expressions run unchanged on a
    streaming DataFrame (no shuffle before the agg).
  * ``windowed_event_rates`` — watermarked tumbling-window aggregation
    over an event-time stream (the late-data pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from har2tree_spark.geo import grid
from har2tree_spark.operators import cascade, parse
from har2tree_spark.schema import DOCUMENTS_SCHEMA


def stream_documents(spark: SparkSession, path: str, max_files: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def incremental_pipeline(
    docs_stream: DataFrame, output_base: str, checkpoint: str
):
    """Streaming query: per micro-batch, run parse + exact cascade and
    append join_result parquet partitioned by batch (idempotent per
    epoch_id — reruns of a failed batch overwrite their own partition)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        feats = parse.parse_documents(batch_df)
        jr = cascade.resolve_exact(feats).withColumn(
            "epoch", F.lit(int(epoch_id))
        )
        (
            jr.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(f"{output_base}/join_result")
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def streaming_tile_counts(docs_stream: DataFrame, level: int = grid.COARSE_RES) -> DataFrame:
    """Continuous per-cell span counts: the parse expressions are narrow,
    so the only stateful operator is the final aggregation."""
    feats = parse.parse_documents(docs_stream)
    zone = grid.col_cell_parent(F.col("cell"), grid.FINE_RES, level)
    return (
        feats.filter(F.col("cell").isNotNull())
        .groupBy(zone.alias("cell"))
        .agg(F.count("*").alias("n_spans"))
    )


def windowed_event_rates(events_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window counts per event type (late rows beyond
    the watermark are dropped — the bounded-state guarantee)."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
    )
