"""Ordered-funnel and cohort-retention analytics over event streams.

Two staples of product analytics engines, expressed shuffle-minimally:

- `funnel_steps`: how many users progress through an ORDERED sequence
  of event types (signup -> click -> purchase).  One shuffle: events
  collapse to a per-user sorted array and a single `F.aggregate` fold
  walks it, advancing a stage counter whenever the current event
  matches the next wanted step — no self-join per step, no window.
  The per-user array is bounded by that user's event count; for
  pathologically hot users swap in the per-step min-timestamp chain
  (k co-partitioned semi-joins) — same answer, k passes.

- `retention_cohorts`: users grouped by first-activity period; for
  each (cohort, offset) the share of the cohort active offset periods
  later.  Two map-side-combined aggregations (first period per user,
  distinct user-periods) joined on user_id — both shuffles are on the
  same key, so AQE co-locates them; period arithmetic is integer
  day-bucketing from a fixed epoch (identical in DuckDB, no
  week-of-year locale traps).

Fold-order determinism: events sort by (ts, event_id) — the tiebreak
makes "after" well-defined on both engines when timestamps collide.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(step, step_name, n_users, conv_from_prev, conv_from_start)
    for each funnel stage, ordered-sequence semantics: an event
    counts only if every earlier step already matched in sorted
    (ts, id) order."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    # event -> its step index (or -1), in per-user sorted order
    depth = F.aggregate(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(id_col).alias("i"),
                        F.col("_code").alias("c"),
                    )
                )
            ),
            lambda e: e["c"],
        ),
        F.lit(0),
        lambda acc, c: acc + F.when(c == acc, 1).otherwise(0),
    )
    code_expr = F.lit(-1)
    for i, s in enumerate(reversed(steps)):
        code_expr = F.when(
            F.col(type_col) == s, len(steps) - 1 - i
        ).otherwise(code_expr)
    per_user = (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("_code", code_expr)
        .groupBy(user_col)
        .agg(depth.alias("depth"))
    )
    totals = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        *[
            F.sum((F.col("depth") >= i + 1).cast("long")).alias(
                f"_n{i}"
            )
            for i in range(len(steps))
        ],
    )
    # all steps explode out of the ONE totals row — a per-step union
    # of selects would re-execute the whole aggregation per step
    step_structs = []
    for i, s in enumerate(steps):
        prev = F.col("n_total") if i == 0 else F.col(f"_n{i - 1}")
        step_structs.append(
            F.struct(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"_n{i}").cast("long").alias("n_users"),
                F.round(
                    F.when(
                        prev > 0, F.col(f"_n{i}") / prev
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("conv_from_prev"),
                F.round(
                    F.when(
                        F.col("n_total") > 0,
                        F.col(f"_n{i}") / F.col("n_total"),
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("conv_from_start"),
            )
        )
    return totals.select(
        F.explode(F.array(*step_structs)).alias("s")
    ).select("s.*")


def retention_cohorts(
    events: DataFrame,
    epoch: str = "2024-01-01",
    period_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_period, period_offset, n_active, n_cohort,
    retention) — the classic retention triangle.  Offset-0 rows are
    the cohort sizes
    (retention 1.0 by construction)."""
    period = (
        F.floor(
            F.datediff(F.to_date(ts_col), F.to_date(F.lit(epoch)))
            / period_days
        )
        .cast("long")
        .alias("period")
    )
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import register_persisted

    # distinct (user, period) is users x live-periods — tiny next to
    # the event stream; persisting it keeps events at ONE scan for
    # the three downstream consumers (cohorts, sizes, the join)
    activity = (
        events.select(F.col(user_col).alias("u"), period)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cohorts = activity.groupBy("u").agg(
        F.min("period").alias("cohort_period")
    )
    sizes = cohorts.groupBy("cohort_period").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    out = (
        activity.join(cohorts, "u")
        .groupBy(
            "cohort_period",
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_period")
        .select(
            "cohort_period",
            "period_offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort"), 6).alias(
                "retention"
            ),
        )
    )
    return register_persisted(out, activity)


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: (src, dst, n_transitions, prob) where prob is the
    row-normalized P(next=dst | current=src).  The behavioral twin of
    the funnel: funnels test ONE hypothesized path, the transition
    matrix surfaces the paths users actually take (and its diagonal
    exposes refresh loops / bot behavior).

    Scale shape: one window over (user, ts, tiebreak) — partitioned
    by user, so parallelism is user-cardinality, no global sort —
    feeding one map-side-combined groupBy(src, dst).  The row
    normalizer joins back as a BROADCAST of the per-src totals (the
    event-type vocabulary is tiny by construction; a window over src
    would collapse each src's transitions into one task — the skew
    trap).  Timestamp ties are broken by `tiebreak_col` so "next" is
    well-defined on both engines.  prob rounded to 6 (integer counts
    divided — exact, but the round keeps parity with future weighted
    variants)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    steps = events.select(
        F.col(type_col).alias("src"),
        F.lead(type_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("src").agg(
        F.sum("n_transitions").alias("_tot")
    )
    return counts.join(F.broadcast(totals), "src").select(
        "src",
        "dst",
        "n_transitions",
        F.round(F.col("n_transitions") / F.col("_tot"), 6).alias("prob"),
    )


def top_event_paths(
    events: DataFrame,
    length: int = 3,
    top_k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Most-travelled length-`length` event paths: (path, n, rank) for
    the top_k most frequent consecutive event-type sequences across
    all users — the unsupervised complement of `funnel_steps` (which
    tests ONE hypothesized path) and the n-step extension of
    `event_transitions`.

    Scale shape: length-1 chained lead() calls over ONE per-user
    window (Catalyst collapses same-window functions into a single
    Window node, so the per-user sort is paid once), then a
    map-side-combined groupBy over the concatenated path.  The final
    top-k window is GLOBAL but runs over the path-COUNT frame, whose
    size is bounded by |event-type vocabulary|^length (hundreds), not
    by the event count — the corpus-sized data never sees a global
    sort.  Count ties break lexicographically by path so the cut is
    deterministic cross-engine."""
    from pyspark.sql import Window

    if length < 2:
        raise ValueError("length must be >= 2")
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, length)
    ]
    paths = events.select(
        F.concat_ws(">", *steps).alias("path"),
        steps[-1].alias("_last"),
    ).filter(F.col("_last").isNotNull())
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counts.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= top_k)
        .select("path", "n", "rank")
    )
