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
fps/sigs/bands and duplicate pairs.  A marker written after the
appends is NOT enough: a crash between an append and the marker
replays the batch against half-committed state.  The protocol here
is a per-batch staged redo log:

1. ``lsh_increment(update="defer")`` computes the pairs and the three
   index deltas with NO writes (everything eagerly checkpointed, so
   the compute is severed from the live index);
2. all four frames are written to a batch-scoped STAGING dir
   (mode=overwrite — a replayed compute wipes any partial staging);
3. a ``_STAGED`` flag commits the staging atomically (single file
   create);
4. the staged files are MOVED into the live tables under
   deterministic per-batch names keyed on each file's staging-relative
   path (``batch-{id}-{md5(rel/name)}.parquet`` — identity-based, so a
   replay that re-lists a PARTIALLY moved staging dir regenerates the
   same name per file), each move skipped if its destination already
   exists;
5. the batch marker is written, then staging is cleaned up.

Replay analysis: crash before (3) → no flag, recompute from scratch
over the unchanged live index (staging overwrite wipes partials);
crash between (3) and (5) → the flag routes the replay to REDO the
moves only (idempotent: deterministic destination names, existing
destinations skipped) without recomputing — correct even though the
live index now holds some of this batch's files; crash after (5) →
the marker short-circuits.  Every staged file lands in the live
table exactly once.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..functions.incremental import lsh_increment


def _touch(path: str) -> None:
    with open(path, "w") as fh:
        fh.write("done")


def _redo_moves(staging: str, dests: dict[str, str], batch_id: int) -> None:
    """Move every staged parquet file into its live table under a
    deterministic name; partition subdirectories (band=…, sbkt=…) are
    preserved.  Idempotent: re-running skips files already moved.

    Destination names derive from each staged file's STABLE identity
    (md5 of its staging-relative path), never from its position in the
    directory listing: after a crash with k of n files already moved,
    a replay re-lists only the n-k survivors, and position-based names
    (enumerate over the remaining files) would collide with the moved
    files' names, hit the exists-skip branch, and silently strand the
    survivors in staging for the post-commit cleanup to delete.
    Staging is immutable once ``_STAGED`` exists, so identity names
    are deterministic across any number of replays."""
    import hashlib

    for sub, dest_root in sorted(dests.items()):
        src_root = os.path.join(staging, sub)
        if not os.path.isdir(src_root):
            continue
        files = []
        for dirpath, _dirs, names in os.walk(src_root):
            rel = os.path.relpath(dirpath, src_root)
            for name in names:
                if name.endswith(".parquet"):
                    files.append((rel, name))
        for rel, name in sorted(files):
            dest_dir = (
                dest_root if rel == "." else os.path.join(dest_root, rel)
            )
            os.makedirs(dest_dir, exist_ok=True)
            ident = hashlib.md5(f"{rel}/{name}".encode()).hexdigest()[:16]
            dest = os.path.join(
                dest_dir, f"batch-{batch_id}-{ident}.parquet"
            )
            src = os.path.join(src_root, rel, name)
            if os.path.exists(dest):
                continue  # replayed move — already landed
            if os.path.exists(src):
                try:
                    os.replace(src, dest)
                except OSError as exc:
                    import errno

                    if exc.errno != errno.EXDEV:
                        raise
                    # staging on a different filesystem than the live
                    # table: fall back to copy + rename + unlink (the
                    # tmp name keeps a half-copied file from ever
                    # matching the exists-skip check on replay)
                    tmp = dest + ".tmp"
                    shutil.copyfile(src, tmp)
                    os.replace(tmp, dest)
                    os.unlink(src)


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
    """Process one micro-batch via the staged redo-log protocol (see
    module docstring); returns False when the batch id was already
    committed (replay) and nothing was touched."""
    os.makedirs(marker_dir, exist_ok=True)
    marker = os.path.join(marker_dir, f"batch-{batch_id}")
    staging = os.path.join(marker_dir, f"stage-{batch_id}")
    staged_flag = staging + ".STAGED"
    if os.path.exists(marker):
        # committed; reap staging leaked by a crash after the marker
        shutil.rmtree(staging, ignore_errors=True)
        if os.path.exists(staged_flag):
            os.unlink(staged_flag)
        return False
    dests = {
        "pairs": pairs_out,
        "fps": f"{index_path}/fps",
        "sigs": f"{index_path}/sigs",
        "bands": f"{index_path}/bands",
    }
    if not os.path.exists(staged_flag):
        pairs, fps_d, sigs_d, bands_d = lsh_increment(
            spark,
            index_path,
            batch_df.select(id_col, text_col),
            id_col=id_col,
            text_col=text_col,
            k=k,
            bands=bands,
            n=n,
            max_bucket=max_bucket,
            update="defer",
        )
        shutil.rmtree(staging, ignore_errors=True)
        pairs.write.mode("overwrite").parquet(f"{staging}/pairs")
        fps_d.write.mode("overwrite").parquet(f"{staging}/fps")
        sigs_d.write.mode("overwrite").partitionBy("sbkt").parquet(
            f"{staging}/sigs"
        )
        bands_d.write.mode("overwrite").partitionBy("band").parquet(
            f"{staging}/bands"
        )
        _touch(staged_flag)
    _redo_moves(staging, dests, batch_id)
    _touch(marker)
    shutil.rmtree(staging, ignore_errors=True)
    os.unlink(staged_flag)
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
