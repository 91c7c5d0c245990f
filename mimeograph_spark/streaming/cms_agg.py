"""Streaming count-min sketch maintenance.

`sketch_agg` (HLL) leans on union IDEMPOTENCE for exactly-once:
replaying a batch unions the same registers and changes nothing.
Count-min state is a SUM, and sums are not idempotent — re-adding a
replayed batch's counters would double-count.  The exactly-once story
here is therefore different, and worth the contrast:

- each micro-batch's counter table (depth x width rows, built by the
  same one-pass `cms_build`) is stored as a PER-BATCH DELTA, upsert-
  keyed by (batch_id, d, bucket);
- foreachBatch redelivery (restart mid-stream) re-presents the SAME
  (batch_id, data) pair, so the recomputed delta overwrites its own
  rows byte-for-byte — idempotent by keying, not by algebra;
- the live counter table is the SUM of all batch deltas at read time
  (counter tables are linear, so the fold order is irrelevant).

Cost per trigger is O(batch) compute and at most depth x width rows
written, independent of history.  Stored state grows by depth x width
rows per batch — bounded and tiny (4 x 256 longs per trigger here);
merge-on-read snapshot compaction folds the file count while the
per-batch keys keep replay overwrites well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.sketches import cms_build, cms_estimate
from ..sources.checkpoint import CheckpointTable

_KEY = "_cell_key"


def _delta_frame(
    batch_df: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    batch_id: int,
) -> DataFrame:
    """One batch's counter rows, upsert-keyed by (batch_id, d,
    bucket) so a redelivered batch overwrites itself."""
    return cms_build(batch_df, key_col, depth=depth, width=width).select(
        F.concat_ws(
            "|", F.lit(batch_id).cast("string"), "d", "bucket"
        ).alias(_KEY),
        F.lit(batch_id).cast("long").alias("batch_id"),
        "d",
        "bucket",
        "cnt",
    )


def cms_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    cms_ckpt: CheckpointTable,
    key_col: str,
    depth: int,
    width: int,
) -> None:
    """foreachBatch body, exposed for direct redelivery testing."""
    delta = _delta_frame(batch_df, key_col, depth, width, batch_id)
    if not delta.isEmpty():
        cms_ckpt.upsert(delta, key=_KEY, meta={"batch_id": batch_id})


def run_cms_stream(
    spark: SparkSession,
    input_dir: str,
    cms_ckpt: CheckpointTable,
    stream_checkpoint_dir: str,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
    available_now: bool = True,
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """Maintain the counter table over a parquet file stream: one
    bounded delta write per trigger, history never re-read."""
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cms_process_batch(
            batch_df, batch_id, cms_ckpt, key_col, depth, width
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", stream_checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_stream_counters(
    spark: SparkSession, cms_ckpt: CheckpointTable
) -> DataFrame | None:
    """Live counter table: the batch deltas summed cell-wise (linear,
    so fold order is irrelevant).  Identical schema to `cms_build` —
    the streamed state is interchangeable with a batch-built sketch."""
    current = cms_ckpt.read_current(spark, key=_KEY)
    if current is None:
        return None
    return current.groupBy("d", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_stream_estimates(
    spark: SparkSession,
    cms_ckpt: CheckpointTable,
    probes: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 256,
) -> DataFrame | None:
    """(key, cms_cnt) frequency estimates against the streamed state."""
    counters = cms_stream_counters(spark, cms_ckpt)
    if counters is None:
        return None
    return cms_estimate(
        counters, probes, key_col, depth=depth, width=width
    )
