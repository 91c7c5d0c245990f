"""Streaming near-dup detection: new documents flow through the
persisted LSH index as they arrive.

`functions/incremental.lsh_increment` is the batch half; this module
runs it per micro-batch under Structured Streaming's foreachBatch —
each trigger probes the index with the batch only, appends the pair
results, and appends the batch to the index so the NEXT trigger sees
it.  The stream's cumulative output therefore equals the batch
pipeline over everything ingested so far (the equivalence
`tests/test_streaming.py` pins against `lsh_candidate_pairs`),
arriving continuously in O(delta) per trigger.

Exactly-once: foreachBatch is at-least-once, and unlike the sketch
stream (whose union state absorbs replays by idempotence) an index
APPEND is not idempotent — a replayed batch would double its rows in
fps/sigs/bands and duplicate pairs.  The standard foreachBatch recipe
applies: a marker file per batch id written AFTER the batch commits;
a replayed id short-circuits before touching anything.  (The marker
dir can sit on the same object store as the index; the driver writes
it, so no coordination is needed beyond the stream's own
single-writer guarantee.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..functions.incremental import lsh_increment


def dedup_batch(
    spark: SparkSession,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    pairs_out: str,
    marker_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    max_bucket: int = 64,
) -> bool:
    """Process one micro-batch; returns False when the batch id was
    already committed (replay) and nothing was touched."""
    os.makedirs(marker_dir, exist_ok=True)
    marker = os.path.join(marker_dir, f"batch-{batch_id}")
    if os.path.exists(marker):
        return False
    pairs = lsh_increment(
        spark,
        index_path,
        batch_df.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        k=k,
        bands=bands,
        n=n,
        max_bucket=max_bucket,
        update=True,
    )
    # lsh_increment(update=True) returns an eager localCheckpoint, so
    # the pair append below cannot see the post-append index state
    pairs.write.mode("append").parquet(pairs_out)
    with open(marker, "w") as fh:
        fh.write("done")
    return True


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    pairs_out: str,
    stream_checkpoint_dir: str,
    marker_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    max_bucket: int = 64,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream a parquet document feed through the dedup index.

    PRECONDITION (inherited from lsh_increment): arrival order must
    be id-monotone across triggers — newer crawls have larger ids."""
    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        dedup_batch(
            batch_df.sparkSession,
            index_path,
            batch_df,
            batch_id,
            pairs_out,
            marker_dir,
            id_col=id_col,
            text_col=text_col,
            k=k,
            bands=bands,
            n=n,
            max_bucket=max_bucket,
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", stream_checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
