"""Time-series resampling: bucket, gap-fill, and last-observation-
carried-forward — the `time_bucket_gapfill` + `locf` contract of
hypertable stores, composed from DataFrame primitives:

1. observed buckets: one map-side-combined aggregation to
   (series, bucket) means — integer epoch-second arithmetic, no
   calendar functions (cross-engine and DST-proof);
2. the dense grid is GENERATED (distinct series x sequence of
   buckets), never shuffled out of the data — series count is small
   by definition and the bucket range is time-span/width, so the
   grid is bounded a priori;
3. LOCF is one window per series ordered by bucket
   (``last(value, ignorenulls=True)``) — parallel across series,
   partition size bounded by the bucket count, not the row count.

Leading gaps (before a series' first observation) stay NULL — LOCF
has nothing to carry — and are flagged like every other gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_secs: int = 600,
) -> DataFrame:
    """(series, bucket_start, n_obs, value_avg, value_filled, is_gap)
    on a dense per-series bucket grid spanning the data's global
    bucket range; gaps carry the series' previous mean forward."""
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import register_persisted

    bucket = (
        F.floor(
            F.col(ts_col).cast("timestamp").cast("long") / bucket_secs
        )
        .cast("long")
        .alias("bucket")
    )
    observed = (
        df.select(F.col(series_col).alias("series"), bucket,
                  F.col(value_col).cast("double").alias("v"))
        .groupBy("series", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.round(F.avg("v"), 6).alias("value_avg"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    span = observed.agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = (
        observed.select("series")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "series",
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(
                "bucket"
            ),
        )
    )
    w = (
        Window.partitionBy("series")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        grid.join(observed, ["series", "bucket"], "left")
        .withColumn(
            "value_filled",
            F.last("value_avg", ignorenulls=True).over(w),
        )
        .select(
            "series",
            (F.col("bucket") * bucket_secs)
            .cast("timestamp")
            .alias("bucket_start"),
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            "value_avg",
            "value_filled",
            F.col("value_avg").isNull().alias("is_gap"),
        )
    )
    return register_persisted(out, observed)
