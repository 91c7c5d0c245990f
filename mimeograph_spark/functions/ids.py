"""Global contiguous row indexing — distributed ranking.

Training pipelines need dense global ids (shard files, sample
manifests, resumable cursors).  Spark's built-ins don't give you
this: ``monotonically_increasing_id`` is neither contiguous nor
stable across runs, ``zipWithIndex`` is an RDD round-trip, and a
bare ``row_number() OVER (ORDER BY ...)`` collapses the corpus into
ONE task — the global-window scale killer.

The scale-correct form is the two-phase ranking every distributed
sort uses (terasort lineage):

1. range-bucket rows by the order key (deterministic arithmetic
   boundaries from the key's min/max — no sampling, so the layout is
   identical on any cluster);
2. count rows per bucket (one tiny aggregate — n_buckets rows to the
   driver, NOT the data);
3. broadcast the per-bucket starting offsets back;
4. ``row_number`` within each bucket (window partitioned by bucket —
   parallel across buckets) plus the bucket's offset.

Total cost: one extra count aggregate over a one-column projection;
the big data moves through exactly one hash/range shuffle, same as
any sort would need.  The result is a pure function of the key set:
contiguous 0..n-1, ordered by the key, identical under any input
partitioning.

Skew note: arithmetic boundaries split the key RANGE evenly, not the
row count; for pathologically clustered numeric keys pass a larger
``n_buckets`` (empty buckets are free — they simply get equal
offsets) or pre-map the key.  For dense id spaces (the common case:
doc ids, order keys) buckets are balanced by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    order_col: str,
    index_col: str = "global_idx",
    n_buckets: int = 256,
) -> DataFrame:
    """Add a dense 0-based ``index_col`` equal to the rank of
    ``order_col`` (which must be numeric and unique) — without the
    data ever forming a single global partition."""
    from pyspark.sql import Window

    lo, hi = df.select(
        F.min(order_col).cast("long"), F.max(order_col).cast("long")
    ).first()
    if lo is None:
        return df.withColumn(index_col, F.lit(None).cast("long"))
    span = hi - lo + 1
    step = max(1, -(-span // n_buckets))  # ceil-div
    bucket = ((F.col(order_col).cast("long") - F.lit(lo)) / F.lit(step)).cast(
        "long"
    )
    staged = df.withColumn("_gi_bucket", bucket)

    counts = staged.groupBy("_gi_bucket").agg(
        F.count(F.lit(1)).alias("_gi_n")
    )
    # Running-sum the n_buckets count rows into starting offsets.
    # This window IS global, but over <= n_buckets rows — the whole
    # point of the two-phase scheme is that only this tiny frame ever
    # sees a single-partition operation.
    wc = Window.orderBy("_gi_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offset_df = counts.select(
        "_gi_bucket",
        F.coalesce(F.sum("_gi_n").over(wc), F.lit(0))
        .cast("long")
        .alias("_gi_offset"),
    )

    w = Window.partitionBy("_gi_bucket").orderBy(order_col)
    return (
        staged.join(F.broadcast(offset_df), "_gi_bucket")
        .withColumn(
            index_col,
            (F.row_number().over(w) - 1 + F.col("_gi_offset")).cast("long"),
        )
        .drop("_gi_bucket", "_gi_offset")
    )
