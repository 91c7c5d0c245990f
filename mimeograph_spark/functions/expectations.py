"""Data-quality expectations — declarative constraint checks computed
in ONE pass over the table (the Deequ/Great-Expectations shape): at
100 TB you verify a dataset by metrics, not by eyeballing rows, and
you cannot afford one scan per rule.

Every rule compiles to an aggregate expression; all rules share a
single groupBy().agg() so the plan is one scan + one partial-combined
aggregation regardless of rule count (the `unique` rule adds Spark's
Expand for its distinct count — still the same single scan).  The
1-row metric record is then unpivoted to one row per rule with
explode, driver-side-free.

Rule kinds:
- ("not_null", col, None)        — col must have no NULLs
- ("unique",   col, None)        — col must have no duplicate values
- ("ge",       col, bound)       — every non-NULL value >= bound
- ("le",       col, bound)       — every non-NULL value <= bound
- ("in",       col, (v1, v2, …)) — every non-NULL value in the set
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Rule = tuple[str, str, object]


def _violations(kind: str, col: str, arg: object):
    c = F.col(col)
    if kind == "not_null":
        return F.sum(c.isNull().cast("long"))
    if kind == "unique":
        return F.count(c) - F.count_distinct(c)
    if kind == "ge":
        return F.sum(F.when(c < F.lit(arg), 1).otherwise(0))
    if kind == "le":
        return F.sum(F.when(c > F.lit(arg), 1).otherwise(0))
    if kind == "in":
        return F.sum(
            F.when(c.isNotNull() & ~c.isin(*arg), 1).otherwise(0)
        )
    raise ValueError(f"unknown rule kind: {kind}")


def check_constraints(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """One output row per rule: (rule, col_name, n_violations,
    passed) — n_violations the exact count of offending rows (for
    `unique`, duplicate rows beyond the first of each value) and
    passed = (n_violations == 0).  All rules ride one scan."""
    aggs = [
        F.coalesce(_violations(k, c, a), F.lit(0))
        .cast("long")
        .alias(f"_r{i}")
        for i, (k, c, a) in enumerate(rules)
    ]
    metrics = df.agg(*aggs)
    stacked = metrics.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("rule"),
                        F.lit(c).alias("col_name"),
                        F.col(f"_r{i}").alias("n_violations"),
                    )
                    for i, (k, c, a) in enumerate(rules)
                ]
            )
        ).alias("_e")
    )
    return stacked.select(
        F.col("_e.rule").alias("rule"),
        F.col("_e.col_name").alias("col_name"),
        F.col("_e.n_violations").alias("n_violations"),
        (F.col("_e.n_violations") == 0).alias("passed"),
    )
