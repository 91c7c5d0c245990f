"""Point-in-time (as-of) join — an operator Spark's DataFrame API
lacks natively, composed from existing primitives.

For each left row, pick the single right row with the greatest
`time_col` <= the left row's time within the same `by` group (ties at
equal time DO match).  The naive formulation — a range join
`l.t >= r.t` plus a per-left-row max — explodes to O(|L| x |R|) pairs
per group before pruning; this implementation instead UNIONS the two
sides and computes a running `last(value, ignorenulls=True)` window
per group in time order: one sort-shuffle on (by, time), zero pair
blowup, which is the shape that survives a 100 TB event table.

Determinism: right rows sort before left rows at equal times (so
equality matches), and among right rows with identical times the
highest first value column wins — callers should pre-dedupe the right
side per (by, time) if they need a different tie rule (the driver
query does, mirroring the oracle's ASOF semantics).
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
) -> DataFrame:
    """Left as-of join: every left row, plus `prefix`-named columns
    carrying the matched right row's `value_cols` (NULL when no right
    row at-or-before the left row's time exists in the group)."""
    by = list(by)
    value_cols = list(value_cols)
    lcols = left.columns
    lstruct_type = StructType([left.schema[c] for c in lcols])
    l = left.select(
        *by,
        F.col(time_col).alias("_t"),
        F.struct(*lcols).alias("_lrow"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
            for c in value_cols
        ],
        F.lit(0).alias("_is_r"),
    )
    r = right.select(
        *by,
        F.col(time_col).alias("_t"),
        F.lit(None).cast(lstruct_type).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.lit(1).alias("_is_r"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col("_t").asc(),
            F.col("_is_r").desc(),
            F.col(f"_rv_{value_cols[0]}").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True)
            .over(w)
            .alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_is_r") == 0).select(
        *[F.col("_lrow")[c].alias(c) for c in lcols],
        *[F.col(f"{prefix}{c}") for c in value_cols],
    )
