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


def heavy_hitters(
    df: DataFrame, key_cols: Sequence[str], k: int = 20
) -> DataFrame:
    """Exact top-k heavy hitters over a grouping key — the skew
    diagnostic run before any big join or aggregation at scale: if
    the top key's share is large, the downstream shuffle needs
    salting or AQE skew handling.  Output, k rows: the key columns
    plus (cnt, share, rank, skew_factor) where share = cnt/total,
    rank is dense 1..k by (cnt desc, key asc — deterministic ties),
    and skew_factor = max_cnt / mean_cnt over ALL keys (>> 1 means a
    skewed distribution; identical on every output row by design).

    Scale shape: one scan with map-side partial aggregation into the
    per-key counts; the global summary (total rows, key count, max
    count) is a second aggregation over the KEY table (already
    sublinear), broadcast-attached; top-k goes through
    TakeOrderedAndProject — no global sort — and the rank window runs
    over k rows only, after the limit."""
    from pyspark.sql import Window

    keys = [F.col(c) for c in key_cols]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    summary = counts.agg(
        F.sum("cnt").alias("_total"),
        F.max("cnt").alias("_max"),
        F.count(F.lit(1)).alias("_nkeys"),
    )
    topk = (
        counts.crossJoin(F.broadcast(summary))
        .orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(k)
    )
    w = Window.orderBy(F.col("cnt").desc(),
                       *[F.col(c).asc() for c in key_cols])
    return topk.select(
        *key_cols,
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
        F.row_number().over(w).cast("int").alias("rank"),
        F.round(
            F.col("_max") / (F.col("_total") / F.col("_nkeys")), 6
        ).alias("skew_factor"),
    )
