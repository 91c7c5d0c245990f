"""Column profiling — the data-quality summary every ingest runs
before training on a new corpus drop.

One `unpivot` (the relational melt — ids stay, value columns become
(column, value) rows) turns per-column statistics into one grouped
aggregation instead of N separate jobs: the table is scanned ONCE no
matter how many columns are profiled, and adding a column adds rows
to a shuffle, not a pass over 100 TB.  Values are profiled as
strings (min/max/mode are well-defined and engine-identical under
string collation; numeric-specific stats belong to the percentile
module).

The mode (top value) uses the deterministic tie-break the rest of
the suite uses: highest count, then lexicographically greatest
value.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile over ONE scan: row/null/distinct counts,
    string min/max, and the modal value with its count.

    Every statistic derives from the (column, value, count) frequency
    table, so the physical plan is scan -> unpivot -> two staged
    aggregations — no second pass, no join, no window.  The mode
    falls out of a struct-max over (count, value): Spark compares
    structs field-wise, which IS the (count desc, value desc)
    tie-break."""
    melted = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot([], list(cols), "col_name", "val")

    counts = melted.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = F.max(
        F.when(
            F.col("val").isNotNull(),
            F.struct(F.col("cnt").alias("c"), F.col("val").alias("v")),
        )
    )
    return counts.groupBy("col_name").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.sum(F.col("val").isNotNull().cast("long"))
        .cast("long")
        .alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.coalesce(top.getField("v"), F.lit("")).alias("top_val"),
        F.coalesce(top.getField("c"), F.lit(0))
        .cast("long")
        .alias("top_count"),
    )
