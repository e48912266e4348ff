"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §1.3: no streaming operators),
but a continuous ingest of documents is the natural production shape
of this engine: the SAME transformations run on a readStream source —
extraction is stateless per document (mapInPandas works unchanged on
streaming DataFrames) and the event rollup is a watermarked windowed
aggregation.

Checkpointing: writeStream's own checkpointLocation gives
exactly-once sink semantics; the batch path's snapshot-manifest resume
(docling_spark.lake) stays the coarse-grained re-run story.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_spans
from ..schema import INPUT_SCHEMA


def corpus_stream(spark: SparkSession, path: str,
                  max_files_per_trigger: Optional[int] = None) -> DataFrame:
    """File-source stream over a parquet directory of (doc_id, spans)."""
    reader = spark.readStream.schema(INPUT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(path)


def extract_stream(corpus: DataFrame) -> DataFrame:
    """Streaming extraction: identical operator as batch — stateless
    per-document Arrow UDF, so the streaming plan is the batch plan."""
    return extract_spans(corpus)


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window event rollup; on a streaming input the watermark
    bounds state for late data, on a batch input it is a no-op."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.floor(F.sum("value") * 100).cast("long")
                  .alias("sum_value_e2"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "sum_value_e2"))


def run_stream_to_table(stream_df: DataFrame, out_dir: str,
                        checkpoint_dir: str, *,
                        available_now: bool = True):
    """Drain a streaming DataFrame to parquet with exactly-once sink
    checkpointing. available_now processes the current backlog and
    stops — the batch-parity mode used by tests and backfills."""
    writer = (stream_df.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    q = writer.trigger(availableNow=True) if available_now \
        else writer.trigger(processingTime="10 seconds")
    query = q.start()
    if available_now:
        query.awaitTermination()
    return query
