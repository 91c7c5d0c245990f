"""Streaming continuous distinct-count aggregate via HLL sketches.

The batch `hypertable_distinct_rollup` answers "distinct users per
window" by merging sketches up the resolution ladder; this module is
its STREAMING maintenance half: each micro-batch's ids are sketched
per (window, key) cell and UNIONED into the persisted sketch table
(merge-on-read upsert into a CheckpointTable), so the running
aggregate is updated in O(delta) per trigger and never re-reads
history — the operational form of a continuous aggregate.

Why sketches are the right state for streaming distinct:

- distinct counts are not summable across micro-batches (the same
  user in two batches must count once), but HLL register maxima are —
  union is associative, commutative and IDEMPOTENT;
- idempotence is the exactly-once story: Structured Streaming's
  foreachBatch is at-least-once, and a REPLAYED batch re-sketches the
  same rows into the same sketch, whose union with the stored state
  changes nothing.  A count-based state would need the manifest
  anti-join to dedup replays; sketch state absorbs them by algebra.

The cell key is (window_start, *keys) packed into one string column —
CheckpointTable's upsert key — so the table stays one row per live
cell with history folded by compaction like any merge-on-read table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.checkpoint import CheckpointTable

_KEY = "_cell_key"


def _cell_frame(
    df: DataFrame,
    window: str,
    time_col: str,
    keys: Sequence[str],
    id_col: str,
    lgk: int,
) -> DataFrame:
    """(cell_key, window_start, *keys, sketch) for one slice of rows."""
    return (
        df.groupBy(F.window(time_col, window).alias("w"), *keys)
        .agg(F.hll_sketch_agg(id_col, F.lit(lgk)).alias("sketch"))
        .select(
            F.concat_ws(
                "|",
                # NTZ timestamps cannot cast straight to BIGINT —
                # hop through TIMESTAMP first (session TZ is pinned
                # UTC, so the epoch is unambiguous)
                F.col("w.start")
                .cast("timestamp")
                .cast("long")
                .cast("string"),
                *[F.col(k) for k in keys],
            ).alias(_KEY),
            F.col("w.start").alias("window_start"),
            *keys,
            "sketch",
        )
    )


def run_sketch_stream(
    spark: SparkSession,
    input_dir: str,
    sketch_ckpt: CheckpointTable,
    stream_checkpoint_dir: str,
    window: str = "10 minutes",
    time_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    id_col: str = "user_id",
    lgk: int = 12,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the sketch table over a parquet file stream.

    Per micro-batch: sketch the batch's cells, union with the stored
    sketches of ONLY the touched cells (read_current is key-resolved,
    the join is against a batch-cell-sized set), upsert the merged
    rows.  Cost per trigger is O(batch + touched cells) — history is
    never rescanned."""
    keys = list(keys)
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = _cell_frame(
            batch_df, window, time_col, keys, id_col, lgk
        )
        current = sketch_ckpt.read_current(batch_df.sparkSession, key=_KEY)
        if current is not None:
            existing = current.select(
                F.col(_KEY),
                F.col("sketch").alias("_old_sketch"),
            )
            delta = (
                delta.join(existing, on=_KEY, how="left")
                .withColumn(
                    "sketch",
                    F.when(
                        F.col("_old_sketch").isNotNull(),
                        F.hll_union(
                            "sketch", "_old_sketch",
                            allowDifferentLgConfigK=False,
                        ),
                    ).otherwise(F.col("sketch")),
                )
                .drop("_old_sketch")
            )
        if not delta.isEmpty():
            sketch_ckpt.upsert(
                delta, key=_KEY, meta={"batch_id": batch_id}
            )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", stream_checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sketch_estimates(
    spark: SparkSession,
    sketch_ckpt: CheckpointTable,
    keys: Sequence[str] = ("event_type",),
) -> DataFrame | None:
    """Resolved estimates per live cell: (window_start, *keys,
    approx_distinct).  The stored state stays sketches — re-mergeable
    by coarser rollups — and only the read converts to numbers."""
    current = sketch_ckpt.read_current(spark, key=_KEY)
    if current is None:
        return None
    return current.select(
        "window_start",
        *keys,
        F.hll_sketch_estimate("sketch").cast("long").alias(
            "approx_distinct"
        ),
    )
