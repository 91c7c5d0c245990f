"""Watermarked stream-stream interval join — the last standard
Structured Streaming surface (alongside foreachBatch, watermarked
windows, and applyInPandasWithState): correlating two live streams
within a bounded time window.

Purchases join the same user's views from the preceding
`lookback` interval.  Both sides carry watermarks and the join
condition bounds event-time distance, so Spark can EXPIRE buffered
state: a view older than (watermark - lookback) can never match a
future purchase and is dropped from the state store.  Without the
time bound, stream-stream join state grows without limit — the
watermark + interval constraint is what makes the operator viable on
an unbounded 100 TB/day event firehose.

Batch equivalence is pinned by a test: the streaming result equals
the identical interval join run as a plain batch query over the same
accumulated input.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

EVENT_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp"


def purchases_with_recent_views(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    lookback: str = "15 minutes",
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Inner interval join: each purchase paired with every view by
    the same user in [purchase.ts - lookback, purchase.ts]."""
    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    joined = purchases.join(
        views,
        F.expr(
            "p_user = v_user AND "
            f"v_ts BETWEEN p_ts - INTERVAL {lookback} AND p_ts"
        ),
    ).select("p_id", "p_user", "p_ts", "v_id", "v_ts")
    return (
        joined.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def purchases_with_recent_views_batch(
    spark: SparkSession, input_dir: str, lookback: str = "15 minutes"
):
    """The same interval join as a plain batch query (the equivalence
    oracle for the streaming form)."""
    ev = spark.read.schema(EVENT_SCHEMA).parquet(input_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    return purchases.join(
        views,
        F.expr(
            "p_user = v_user AND "
            f"v_ts BETWEEN p_ts - INTERVAL {lookback} AND p_ts"
        ),
    ).select("p_id", "p_user", "p_ts", "v_id", "v_ts")
