"""Custom stateful streaming operator via applyInPandasWithState.

Watermarked windowed aggregation (event_time.py) covers time-bucketed
state; this covers ARBITRARY per-key state — the running per-user
counters/accumulators a training-data ingest keeps across micro-batches
(documents seen per source, bytes per crawl host, ...).  State lives in
Spark's state store under the streaming checkpoint, so it survives
restarts and scales horizontally with the key space: each executor
holds only its key partitions' state.

The grouped-map function receives Arrow batches per key plus a
GroupState handle; it is the Structured Streaming analogue of the
batch UDAF in functions/textstats.quality_percentiles_by_lang.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = "event_id long, user_id long, value double"
OUTPUT_SCHEMA = (
    "user_id long, batch_events long, total_events long, total_value double"
)
STATE_SCHEMA = "total_events long, total_value double"


def _track_user_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    batch_events = 0
    batch_value = 0.0
    for pdf in pdfs:
        batch_events += len(pdf)
        batch_value += float(pdf["value"].sum())
    if state.exists:
        total_events, total_value = state.get
    else:
        total_events, total_value = 0, 0.0
    total_events += batch_events
    total_value += batch_value
    state.update((total_events, total_value))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "batch_events": batch_events,
                "total_events": total_events,
                "total_value": round(total_value, 4),
            }
        ]
    )


def running_user_totals(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Per-user running event/value totals across all micro-batches
    ever processed (availableNow per call; state persists in the
    checkpoint between calls)."""
    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        _track_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
