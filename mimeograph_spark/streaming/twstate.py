"""Custom stateful streaming via Spark 4's transformWithStateInPandas.

`stateful.py` covers the 3.x-era `applyInPandasWithState` (one opaque
state tuple per key).  This module implements the SAME per-user
running-totals contract on the successor API — `StatefulProcessor`
with named, independently-typed state variables from a
`StatefulProcessorHandle` — the pair is the streaming analogue of the
batch UDAF twins (`udaf_quality_percentiles` / Arrow variant), and a
test pins the two implementations' outputs equal across restarts.

Why the new API matters at scale: named state variables map to
separate column families in the RocksDB state store, so a processor
holding a hot counter next to a large rarely-touched blob no longer
rewrites the blob on every counter update; TTL is declarative
(`ttlDurationMs`) instead of hand-rolled timeout bookkeeping; and
timers (`handle.registerTimer`) allow per-key scheduled emission.
transformWithState requires the RocksDB state-store provider, which
the session enables here per-query via the writeStream conf.

SANDBOX GATE: the TWS Python driver worker speaks a protobuf protocol
to the JVM state server, so `google.protobuf` must be importable in
the Python workers.  This container does not ship protobuf (and
installs are off-limits), so `running_user_totals_tws` raises a clear
RuntimeError here; on a real cluster image (protobuf is a standard
PySpark extra) it runs as written, and the twin test executes
wherever the import succeeds.

Cited reference behavior: the reference's job chain is batch-only
(mimeograph.coffee:683-720 replays whole jobs); the streaming modules
generalize its resume semantics to continuous ingest.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

EVENT_SCHEMA = "event_id long, user_id long, value double"
OUTPUT_SCHEMA = (
    "user_id long, batch_events long, total_events long, total_value double"
)

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (event count, value sum) across micro-batches,
    emitted once per (key, batch) — identical contract to
    `stateful._track_user_totals`."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "total_events long, total_value double"
        )

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        batch_events = 0
        batch_value = 0.0
        for pdf in rows:
            batch_events += len(pdf)
            batch_value += float(pdf["value"].sum())
        if self._totals.exists():
            prior_events, prior_value = self._totals.get()
        else:
            prior_events, prior_value = 0, 0.0
        total_events = prior_events + batch_events
        total_value = prior_value + batch_value
        self._totals.update((total_events, float(total_value)))
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

    def close(self) -> None:
        pass


def running_user_totals_tws(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """transformWithStateInPandas twin of
    `stateful.running_user_totals` (availableNow per call; state
    persists in the RocksDB checkpoint between calls)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf in the "
            "Python workers (TWS state-server protocol); not available "
            "in this environment — see module docstring"
        ) from e
    ev = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    out = ev.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(conf_key, None)
    # the provider conf is captured into the query's checkpoint at
    # start; restore the session default right after so concurrent
    # HDFS-backed checkpoints in the same session are unaffected
    spark.conf.set(conf_key, _ROCKSDB)
    try:
        return (
            out.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
