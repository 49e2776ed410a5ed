"""Watermarked event-time aggregation over an events stream.

EXTENSION, not reference parity (the reference is batch-only — SURVEY
§2.9 flags any streaming op beyond availableNow ingest as an extension).
Demonstrates the Structured Streaming surface a large-scale pipeline
needs: event-time tumbling windows, late-data handling via watermark, and
stateful stream dedup.

All functions take a streaming OR batch DataFrame with the events schema
(``ts timestamp, user_id long, event_type string, value double``) — the
same code path runs in both modes (Spark's unified API), which is how the
tests pin streaming results to their batch twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Watermark bounds state: windows older than (max event time − watermark)
    are finalized and dropped from the state store — late rows beyond that
    are discarded, the documented trade-off for bounded state at scale."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def deduped_stream(
    events: DataFrame, id_col: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """Exactly-once-per-id stream: dropDuplicatesWithinWatermark keeps
    state only for ids inside the watermark horizon (unbounded-state-safe
    vs plain dropDuplicates on a stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


def run_available_now_to_memory(
    df: DataFrame, name: str, checkpoint_path: str, output_mode: str = "append"
):
    """Drain a bounded stream into an in-memory table (test/debug sink)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
