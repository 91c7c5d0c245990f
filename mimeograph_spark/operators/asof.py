"""Point-in-time (as-of) join — an operator Spark's DataFrame API
lacks natively, composed from existing primitives.

For each left row, pick the single right row with the greatest
`time_col` <= the left row's time within the same `by` group (ties at
equal time DO match).  The naive formulation — a range join
`l.t >= r.t` plus a per-left-row max — explodes to O(|L| x |R|) pairs
per group before pruning; this implementation instead UNIONS the two
sides and computes a running `last(matched_row, ignorenulls=True)`
window per group in time order: one sort-shuffle on (by, time), zero
pair blowup, which is the shape that survives a 100 TB event table.

All output value columns come from the SAME matched right row: the
fill carries one struct of every value column (a right row whose
value column is NULL yields NULL for that column — it never inherits
the field from an older right row).

Determinism: right rows sort before left rows at equal times (so
equality matches), and among right rows with identical times the one
with the highest first value column wins — callers that need a
different tie rule should pre-dedupe the right side per (by, time)
(the driver query does, keeping max event_id per (user_id, ts),
mirrored in the oracle).

Skew: the single-window form serializes each `by` group's full
timeline on one task — one hot key (a bot user with 10^8 events)
becomes a straggler.  `time_bucket` switches to a two-phase variant:
rows are windowed within (by, time-bucket) partitions — bounded by
the bucket's row count, so a hot key splits across buckets — and a
tiny per-(by, bucket) carry frame (one row per non-empty bucket)
propagates the last match across bucket boundaries.  Costs two extra
small shuffles; buys a hard per-task bound.  Both forms return
identical results (pinned by a skew-fixture test).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: Sequence[str] = ("user_id",),
    value_cols: Sequence[str] = ("event_id",),
    prefix: str = "asof_",
    time_bucket: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus `prefix`-named columns
    carrying the matched right row's `value_cols` (NULL when no right
    row at-or-before the left row's time exists in the group).

    `time_bucket` (e.g. "1 day"): use the skew-safe two-phase form
    with windows partitioned by (by, bucket) instead of (by)."""
    by = list(by)
    value_cols = list(value_cols)
    lcols = left.columns
    lstruct_type = StructType([left.schema[c] for c in lcols])
    rv_type = StructType([right.schema[c] for c in value_cols])
    l = left.select(
        *by,
        F.col(time_col).alias("_t"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(0).alias("_is_r"),
    )
    r = right.select(
        *by,
        F.col(time_col).alias("_t"),
        F.lit(None).cast(lstruct_type).alias("_lrow"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rv"),
        F.lit(1).alias("_is_r"),
    )
    u = l.unionByName(r)
    order = [
        F.col("_t").asc(),
        F.col("_is_r").desc(),
        F.col("_rv")[value_cols[0]].asc_nulls_first(),
    ]
    if time_bucket is None:
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.select(
            "*", F.last("_rv", ignorenulls=True).over(w).alias("_match")
        )
    else:
        bkt = F.window("_t", time_bucket)["start"]
        u = u.withColumn("_bkt", bkt)
        # phase 1: running last WITHIN each (by, bucket) — the task
        # bound is the bucket's row count, not the key's.
        w_in = (
            Window.partitionBy(*by, "_bkt")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = u.select(
            "*", F.last("_rv", ignorenulls=True).over(w_in).alias("_local")
        )
        # phase 2: per-(by, bucket) last right value — one row per
        # non-empty right bucket (max_by on (t, tiebreak) = the row
        # the running window would have kept)...
        rb = r.withColumn("_bkt", bkt).groupBy(*by, "_bkt").agg(
            F.max_by(
                "_rv", F.struct(F.col("_t"), F.col("_rv")[value_cols[0]])
            ).alias("_blast")
        )
        # ...carried forward across STRICTLY EARLIER buckets.  Every
        # bucket seen in the union participates (left-only buckets get
        # NULL _blast and inherit the carry), and the carry window's
        # per-key frame is #buckets rows — tiny by construction.
        buckets = u.select(*by, "_bkt").distinct()
        w_carry = (
            Window.partitionBy(*by)
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            buckets.join(rb, on=[*by, "_bkt"], how="left")
            .select(
                *by,
                "_bkt",
                F.last("_blast", ignorenulls=True)
                .over(w_carry)
                .alias("_carry"),
            )
        )
        filled = local.join(carry, on=[*by, "_bkt"], how="left").select(
            *local.columns,
            F.coalesce("_local", "_carry").alias("_match"),
        )
    return filled.filter(F.col("_is_r") == 0).select(
        *[F.col("_lrow")[c].alias(c) for c in lcols],
        *[F.col("_match")[c].alias(f"{prefix}{c}") for c in value_cols],
    )
