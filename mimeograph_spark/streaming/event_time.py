"""Event-time streaming aggregation with watermark-based late-data
handling — the streaming twin of plans.relational.events_tumbling_window.

The batch pipeline treats event time as just another column; a
continuous ingest can't, because state for open windows must be
bounded.  The watermark contract (Structured Streaming semantics):

- watermark = max(event time seen in prior micro-batches) - delay;
- in append mode a window row is emitted exactly once, when the
  watermark passes the window end (the window is finalized);
- input rows older than the watermark are dropped — they can never
  reopen a finalized window, so state size stays bounded no matter how
  disordered the stream is.

The sink is a parquet file sink (exactly-once via the sink's
_spark_metadata transaction log + the source checkpoint), so a
downstream batch reader sees each finalized window exactly once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

# Minimal event shape for the demo stream (mirrors the events table).
EVENT_STREAM_SCHEMA = (
    "event_id long, event_type string, ts timestamp, value double"
)


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark_delay: str = "10 minutes",
) -> StreamingQuery:
    """Tumbling-window event counts over a file stream, append mode.

    Each call processes everything currently in `input_dir`
    (availableNow) and stops; the watermark survives restarts via
    `checkpoint_dir`, so a later call drops events that arrive behind
    the watermark established by earlier calls."""
    ev = spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(input_dir)
    agg = (
        ev.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def dedup_event_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "10 minutes",
) -> StreamingQuery:
    """Streaming exact deduplication by event_id with BOUNDED state.

    A plain dropDuplicates on a stream must remember every key it has
    ever seen — state grows with the corpus and the query eventually
    dies.  dropDuplicatesWithinWatermark keeps a key only until the
    watermark passes its event time: duplicates are suppressed as long
    as they arrive within the lateness bound, and state is evicted
    behind the watermark — the contract that makes streaming dedup
    viable on an unbounded ingest (at-least-once sources like Kafka
    re-deliver within bounded lateness, which is exactly the window
    this covers).

    Exactly-once delivery to the parquet sink composes with it: a
    restart replays the micro-batch, the sink's transaction log
    ignores the duplicate files, and the dedup state itself is part
    of the checkpoint."""
    ev = spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(input_dir)
    deduped = ev.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def session_window_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> StreamingQuery:
    """Event-time SESSION windows on a stream: variable-length
    windows that extend while events keep arriving within `gap` and
    close when the watermark passes last_event + gap.  Unlike fixed
    tumbling windows, the engine must MERGE overlapping candidate
    windows as late-but-in-bound events bridge two sessions — the
    stateful behavior this function exists to pin; the batch twin is
    the same session_window aggregation over the accumulated input
    (and the lag/cumsum formulation relational.events_sessionize
    uses)."""
    ev = spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(input_dir)
    agg = (
        ev.withWatermark("ts", watermark_delay)
        .groupBy(
            F.session_window("ts", gap).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
