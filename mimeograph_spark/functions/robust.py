"""Robust (median/MAD) outlier detection over a numeric column.

The mean/std z-score (`similarity.embedding_outliers` uses it in
embedding space) is itself dragged by the outliers it hunts; the
robust form — modified z = 0.6745 * (x - median) / MAD with the
Iglewicz-Hoaglin 3.5 cut — has a 50% breakdown point and is the
standard anomaly gate for telemetry/event values.

Scale shape: two passes of the rank-arithmetic percentile machinery
(functions/quantiles.exact_percentiles) — median of x per group, then
median of |x - median| per group — both partition-parallel across the
bounded `by` groups; the per-group stats broadcast back onto the
stream.  Determinism: the medians round to 6 before any downstream
arithmetic, x itself is raw input, and both engines evaluate the same
expression order, so round(rz, 4) agrees exactly (DuckDB
quantile_cont matches the rank arithmetic bit-for-bit — established
by the length_percentiles family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quantiles import exact_percentiles


def mad_outliers(
    df: DataFrame,
    value_col: str = "value",
    by: str = "event_type",
    id_col: str = "event_id",
    k: float = 3.5,
) -> DataFrame:
    """Per row: the modified z-score of `value_col` against its
    group's median/MAD and an `is_outlier` flag at |rz| > k.  The
    score is emitted as INTEGER micro-units (rz_micro = rz * 1e6,
    nearest integer) — cross-engine-safe where a rounded FP column is
    not.  Groups whose MAD is 0 (over half the values identical) flag
    nothing — rz_micro is 0 there.  Output: (id, group, value,
    rz_micro, is_outlier)."""
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import register_persisted

    med = exact_percentiles(df, value_col, by, qs=(0.5,)).select(
        by, F.col("p50").alias("_med")
    )
    # two consumers (MAD pass + scored output): persist so the source
    # is scanned once and the med join runs once
    devs = (
        df.select(id_col, by, value_col)
        .join(F.broadcast(med), by)
        .withColumn(
            "_dev", F.abs(F.col(value_col) - F.col("_med"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mad = exact_percentiles(devs, "_dev", by, qs=(0.5,)).select(
        by, F.col("p50").alias("_mad")
    )
    # integer micro-units, not a rounded FP column: with 2-decimal
    # inputs the raw score lands EXACTLY on .5e-4 lattice points where
    # Spark's (BigDecimal HALF_UP on the shortest repr) and DuckDB's
    # round-to-4 disagree; at micro scale the nearest integer is the
    # same on both engines (the micro-nat logprob convention)
    rz_micro = F.when(
        F.col("_mad") > 0,
        F.round(
            F.lit(0.6745)
            * (F.col(value_col) - F.col("_med"))
            / F.col("_mad")
            * F.lit(1000000.0),
            0,
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    cut = int(round(float(k) * 1000000))
    out = devs.join(F.broadcast(mad), by).select(
        F.col(id_col),
        F.col(by),
        F.col(value_col),
        rz_micro.alias("rz_micro"),
        (F.abs(rz_micro) > F.lit(cut)).alias("is_outlier"),
    )
    return register_persisted(out, devs)
