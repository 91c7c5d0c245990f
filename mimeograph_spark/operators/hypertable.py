"""Hypertable-style multi-resolution rollup (continuous aggregates).

A time-series store keeps the same aggregate at several resolutions
(10 min -> 1 h -> 1 d).  The scalable property is HOW the coarse
levels are built: each level re-aggregates the PREVIOUS level's
partial aggregates (counts and sums compose exactly), so raw data is
read once no matter how many resolutions exist — at 100 TB the 1-day
rollup touches the few-MB hourly frame, not the raw events.

Every level shares one output schema (resolution label + window start
+ keys + composable measures), so the union is a single queryable
hypertable.  Derived measures (avg = sum/count) are computed at read
time from the composable ones, never stored.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hypertable_rollup(
    events: DataFrame,
    time_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
    resolutions: Sequence[str] = ("10 minutes", "1 hour", "1 day"),
) -> DataFrame:
    """Union of windowed (count, sum) aggregates at each resolution;
    level 0 reads the raw events, level N reads level N-1."""
    keys = list(keys)
    finest = (
        events.groupBy(F.window(time_col, resolutions[0]).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.lit(resolutions[0]).alias("resolution"),
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )
    levels = [finest]
    for res in resolutions[1:]:
        prev = levels[-1]
        levels.append(
            prev.groupBy(F.window("window_start", res).alias("w"), *keys)
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
            .select(
                F.lit(res).alias("resolution"),
                F.col("w.start").alias("window_start"),
                *keys,
                "n_events",
                "sum_value",
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.withColumn("sum_value", F.round("sum_value", 4))
