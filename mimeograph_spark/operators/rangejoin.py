"""Binned range join — the scalable form of point-in-interval joins.

Spark plans a bare `p.v BETWEEN i.lo AND i.hi` join as a
BroadcastNestedLoopJoin (or a cartesian product when neither side
fits in memory): every point is tested against every interval.  The
standard fix is binning: explode each interval to the fixed-width
bins it overlaps, key each point to its single bin, equi-join on the
bin (a plain hash join), and apply the exact containment predicate as
a post-join filter.  Candidate pairs are bounded by
|points| x (intervals overlapping each point's bin) instead of
|points| x |intervals|, and the plan contains no nested loop
(pinned by tests/test_plans.py).

Pick `bin_width` near the typical interval length: wider bins mean
fewer interval replicas but more false candidates per bin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how_hi: str = "exclusive",
) -> DataFrame:
    """All (point, interval) pairs with lo <= point < hi (or <= hi when
    how_hi='inclusive').  Output: every points column + every intervals
    column."""
    w = F.lit(float(bin_width))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "_bin", F.floor(F.col(point_col) / w).cast("long")
    )
    hi_pred: Column = (
        F.col(point_col) <= F.col(hi_col)
        if how_hi == "inclusive"
        else F.col(point_col) < F.col(hi_col)
    )
    return (
        pt.join(iv, on="_bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & hi_pred)
        .drop("_bin")
    )
