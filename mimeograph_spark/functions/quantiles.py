"""Exact distributed percentiles via rank arithmetic.

Spark's exact ``percentile()`` aggregate buffers every value of a
group in executor memory — at 100 TB a single language bucket
overflows the heap long before the query finishes.  The scale-honest
exact form is the same computation a distributed SORT uses: rank the
rows within each group (a partitioned, disk-spilling sort), join the
per-group counts back, and read the interpolated value off the two
bracketing ranks.  Parallelism is bounded by the number of groups —
the irreducible cost of EXACT quantiles; when 1e-3 relative error is
acceptable, ``approx_percentile`` (t-digest-style mergeable sketch,
fully parallel) is the right tool instead, and this module is the
exactness baseline it gets validated against.

Interpolation follows the standard linear definition (NumPy
``linear``, SQL ``percentile_cont``, DuckDB ``quantile_cont``):
``pos = q*(n-1); v = v[floor(pos)] + (pos-floor(pos)) *
(v[ceil(pos)] - v[floor(pos)])`` over the ascending values.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    by: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-`by`-group exact percentiles of `value_col`.  Output: one
    row per group with columns ``n`` and ``p{q*100:g}`` per q."""
    w = Window.partitionBy(by).orderBy(F.col(value_col).asc())
    ranked = df.select(by, value_col).withColumn(
        "_rn", F.row_number().over(w)
    )
    counts = df.groupBy(by).agg(F.count(F.lit(1)).alias("_n"))
    joined = ranked.join(F.broadcast(counts), by)

    v = F.col(value_col).cast("double")
    aggs = [F.max("_n").cast("long").alias("n")]
    for q in qs:
        pos = (F.col("_n") - 1) * F.lit(float(q))
        lo = F.floor(pos)
        hi = F.ceil(pos)
        val_lo = F.max(F.when(F.col("_rn") - 1 == lo, v))
        val_hi = F.max(F.when(F.col("_rn") - 1 == hi, v))
        frac = F.max(pos - lo)
        name = f"p{q * 100:g}".replace(".", "_")
        aggs.append(
            F.round(val_lo + frac * (val_hi - val_lo), 6).alias(name)
        )
    return joined.groupBy(by).agg(*aggs)


def histogram_bins(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Fixed-range histogram as (bin, cnt) rows — one map-side-
    combined pass; bin tables from disjoint shards ADD cell-wise.
    Out-of-range values clamp to the edge bins."""
    width = (hi - lo) / bins
    x = F.col(value_col).cast("double")
    b = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((x - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )
    return (
        df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """MERGEABLE approximate quantiles from a fixed-range histogram —
    the sketch-family complement to `exact_percentiles`:

    - build is one map-side-combined pass collapsing the stream to at
      most `bins` (bin, cnt) rows; bin tables from disjoint shards
      ADD cell-wise (same linearity as the count-min counters), so
      the sketch streams, shards and rolls up freely;
    - estimates read the cumulative histogram: the first bin whose
      running mass reaches q*n, linearly interpolated inside it —
      error is bounded by one bin width, chosen upfront by (hi-lo)/
      bins, the monitoring-histogram contract (range fixed a priori,
      e.g. latencies in [0, 10s)); out-of-range values clamp to the
      edge bins.

    The only non-parallel step is the cumulative window over the
    BINS-row histogram — bounded by `bins`, never by data.  Output:
    one row per q: (q, hist_est)."""
    if hi <= lo or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import register_persisted

    width = (hi - lo) / bins
    # <= bins rows; persisted so the cumulative walk and the total
    # don't each recompute the full input pass
    hist = histogram_bins(df, value_col, lo, hi, bins).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    )
    total = hist.agg(F.sum("cnt").cast("double").alias("_t"))
    spark = df.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    tgt = F.col("q") * F.col("_t")
    picked = (
        qdf.crossJoin(F.broadcast(total))
        .join(F.broadcast(cum), F.col("cum") >= tgt)
        .groupBy("q", "_t")
        .agg(
            F.min(F.struct("bin", "cnt", "cum_prev")).alias("s")
        )
    )
    out = picked.select(
        "q",
        F.round(
            F.lit(lo)
            + F.lit(width)
            * (
                F.col("s.bin")
                + (tgt - F.col("s.cum_prev")) / F.col("s.cnt")
            ),
            6,
        ).alias("hist_est"),
    )
    return register_persisted(out, hist)
