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
