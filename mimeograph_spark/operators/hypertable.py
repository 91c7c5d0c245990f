"""Hypertable-style multi-resolution rollup (continuous aggregates).

A time-series store keeps the same aggregate at several resolutions
(10 min -> 1 h -> 1 d).  The scalable property is HOW the coarse
levels are built: each level re-aggregates the PREVIOUS level's
partial aggregates (counts and sums compose exactly), AND each level
is materialized (persisted) before the next derives from it — so the
raw data is PHYSICALLY read once no matter how many resolutions
exist.  Without the materialization the logical reuse is a lie:
Catalyst inlines the finer level into every consumer and the executed
plan re-scans the raw events once per resolution (audited at 3 scans
for 3 levels) — at 100 TB that is 3 full corpus scans.  With it, the
union branch for level N and the derivation of level N+1 both read
level N's cached frame (a plan test pins zero top-level file scans).

On a real deployment each level would be committed to its own
checkpoint/Iceberg table (that is what "continuous aggregate" means
operationally); the in-session equivalent is MEMORY_AND_DISK persist,
released by the caller via `cacheutil.unpersist_deps(result)`.

Every level shares one output schema (resolution label + window start
+ keys + composable measures), so the union is a single queryable
hypertable.  Derived measures (avg = sum/count) are computed at read
time from the composable ones, never stored.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cacheutil import register_persisted


def hypertable_rollup(
    events: DataFrame,
    time_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    value_col: str = "value",
    resolutions: Sequence[str] = ("10 minutes", "1 hour", "1 day"),
    materialize: bool = True,
) -> DataFrame:
    """Union of windowed (count, sum) aggregates at each resolution;
    level 0 reads the raw events, level N reads level N-1.

    `materialize` persists every level that has two consumers (its own
    union branch + the next level's derivation); the last level has
    one consumer and is never persisted.  Release the caches with
    `cacheutil.unpersist_deps` on the returned frame."""
    from pyspark.storagelevel import StorageLevel

    keys = list(keys)
    persisted: list[DataFrame] = []
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
    if materialize:
        finest = finest.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(finest)
    levels = [finest]
    for res in resolutions[1:]:
        prev = levels[-1]
        lv = (
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
        if materialize and res != resolutions[-1]:
            lv = lv.persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(lv)
        levels.append(lv)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    out = out.withColumn("sum_value", F.round("sum_value", 4))
    return register_persisted(out, *persisted)


def hypertable_distinct_rollup(
    events: DataFrame,
    time_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    id_col: str = "user_id",
    resolutions: Sequence[str] = ("10 minutes", "1 hour", "1 day"),
    materialize: bool = True,
    lgk: int = 12,
) -> DataFrame:
    """Multi-resolution DISTINCT-count rollup via re-aggregatable HLL
    sketches — the production answer to "distinct users per window"
    at 100 TB, where exact count-distinct cannot compose across
    levels (distinct is not summable: the same user in two 10-minute
    windows must count once in the hour).

    Each 10-minute cell stores an HLL sketch of its ids
    (`hll_sketch_agg`, Datasketches-backed, ~1.6% relative error at
    lgk=12); every coarser level UNIONS the finer level's sketches
    (`hll_union_agg`) — set union is exactly what HLL registers
    support losslessly, so the 1-day estimate is the same sketch
    state it would have been over raw data, while the raw ids are
    physically read ONCE (same materialization discipline as
    `hypertable_rollup`; without it Catalyst re-scans raw per level).
    Estimates surface via `hll_sketch_estimate`; the binary sketch
    column is dropped from the result (store it instead of the
    estimate when persisting levels to a table — that is what makes
    the rollup incrementally maintainable).

    Not SQL-oracle-expressible: sketch binaries differ across
    engines, so verification is the in-suite tolerance + merge-
    consistency tests (tests/test_functions.py)."""
    from pyspark.storagelevel import StorageLevel

    keys = list(keys)
    persisted: list[DataFrame] = []
    finest = (
        events.groupBy(F.window(time_col, resolutions[0]).alias("w"), *keys)
        .agg(F.hll_sketch_agg(id_col, F.lit(lgk)).alias("sketch"))
        .select(
            F.lit(resolutions[0]).alias("resolution"),
            F.col("w.start").alias("window_start"),
            *keys,
            "sketch",
        )
    )
    if materialize:
        finest = finest.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(finest)
    levels = [finest]
    for res in resolutions[1:]:
        prev = levels[-1]
        lv = (
            prev.groupBy(F.window("window_start", res).alias("w"), *keys)
            .agg(F.hll_union_agg("sketch").alias("sketch"))
            .select(
                F.lit(res).alias("resolution"),
                F.col("w.start").alias("window_start"),
                *keys,
                "sketch",
            )
        )
        if materialize and res != resolutions[-1]:
            lv = lv.persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(lv)
        levels.append(lv)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    out = out.select(
        "resolution",
        "window_start",
        *keys,
        F.hll_sketch_estimate("sketch").cast("long").alias(
            "approx_distinct"
        ),
    )
    return register_persisted(out, *persisted)
