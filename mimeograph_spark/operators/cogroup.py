"""Cogrouped Arrow UDF surface: applyInPandas over a COGROUP.

`df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas(...)` is the
API for per-key logic that needs BOTH sides' rows at once — the
escape hatch when a join can't express the pairwise computation.  It
shuffles each side once on the key and streams matched key-groups
through Arrow into pandas, so the cost model is exactly a shuffle
join whose "join function" is arbitrary Python: scale-safe as long
as single keys fit a task (same bound as any grouped UDF).

The demonstration operator is a per-user backward as-of merge
(purchase events matched to the latest at-or-before view) —
``pd.merge_asof`` semantics, executed as one NumPy searchsorted per
group so the Python body stays a few vector ops.  The declarative twin (`operators/asof.py`) is
the right production shape (no Python); this module exists to cover
the cogroup surface with semantics that a DuckDB `ASOF LEFT JOIN`
oracle can replay exactly, so the Arrow plumbing is verified
end-to-end, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cogrouped_asof_lag(purchases: DataFrame, views: DataFrame) -> DataFrame:
    """Per user: purchase count, how many purchases have a prior (or
    simultaneous) view, and the summed view->purchase lag in integer
    microseconds (exact — no FP sum to diverge across engines).
    Input frames need (user_id, ts); rows stream through one cogrouped
    Arrow UDF per user."""
    import numpy as np
    import pandas as pd

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_purchases": pd.Series(dtype="int64"),
                    "n_matched": pd.Series(dtype="int64"),
                    "total_lag_us": pd.Series(dtype="int64"),
                }
            )
        # the backward as-of match is a searchsorted over the sorted
        # view timestamps — the same semantics as pd.merge_asof
        # (direction="backward", exact timestamps included, last
        # duplicate wins; duplicates share one ts value so the lag is
        # identical either way) without building/sorting intermediate
        # DataFrames per group: the per-group invocation overhead is
        # the cost model of this operator (~1 call per user), so the
        # body is pure NumPy on int64 nanoseconds
        lts = left["ts"].to_numpy("datetime64[ns]").astype("int64")
        rts = np.sort(right["ts"].to_numpy("datetime64[ns]").astype("int64"))
        idx = np.searchsorted(rts, lts, side="right") - 1
        matched = idx >= 0
        # integer microseconds: the lag sum is exact on both engines
        # (a float-seconds sum can land on a rounding boundary and
        # diverge in the last rounded digit — observed at sf0.1);
        # per-element floor division BEFORE the sum, exactly the
        # Timedelta-division semantics of the pandas form
        lag_us = (lts[matched] - rts[idx[matched]]) // 1000
        return pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_purchases": [len(lts)],
                "n_matched": [int(matched.sum())],
                "total_lag_us": [int(lag_us.sum())],
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id long, n_purchases long, n_matched long, "
            "total_lag_us long",
        )
    )
