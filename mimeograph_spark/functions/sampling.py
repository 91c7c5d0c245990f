"""Deterministic sampling and dataset splitting.

Training-data pipelines sample and split constantly (held-out eval
sets, ablation subsets, decontamination spot-checks).  Spark's
`df.sample`/`sampleBy` seed their RNG per partition, so results
change with partition layout — rerunning on a different cluster size
silently yields a different sample.  The scale-correct form is
HASH-based: membership is a pure function of the row's id, so the
sample is reproducible on any cluster, any partitioning, any engine
(the DuckDB oracle replays it exactly), and a document's split
assignment never flips between runs — the property that keeps eval
sets honest.

Everything is md5 arithmetic on built-in columns (codegen, no RNG, no
shuffle — sampling is a pure filter, splitting a pure projection).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10000


def hash_bucket(
    id_col: Column, salt: str = "split", n_buckets: int = N_BUCKETS
) -> Column:
    """Uniform bucket in [0, n_buckets) from md5(salt:id) — the same
    construction the MinHash/SimHash stages use, shared with DuckDB."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return h % n_buckets


def deterministic_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~`rate` of rows, membership a pure function of the id."""
    return df.filter(
        hash_bucket(F.col(id_col), salt) < int(rate * N_BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-group balanced downsampling, scale-safe form: keep ~`cap`
    rows per group via a per-group hash threshold.

    The exact-cap alternative (rank within group, keep first `cap`)
    needs a window partitioned by group — at 100 TB one dominant
    language would serialize 20 TB through a single task.  This form
    needs only a tiny per-group count aggregate broadcast back; the
    keep decision is then a pure per-row filter, fully parallel, and
    deterministic (same md5-bucket primitive as splitting, so the
    kept set is a function of ids — the DuckDB oracle replays it).
    The kept count per group is cap +/- binomial noise; use
    :func:`stratified_sample_exact` when groups are known to fit a
    task (e.g. after this pass has already shrunk them)."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_sg_n"))
    thr = F.least(
        F.lit(N_BUCKETS).cast("long"),
        F.expr(f"CAST({cap} AS BIGINT) * {N_BUCKETS} div _sg_n"),
    )
    return (
        df.join(F.broadcast(counts), group_col)
        .filter(hash_bucket(F.col(id_col), salt) < thr)
        .drop("_sg_n")
    )


def stratified_sample_exact(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exact per-group cap: deterministic hash-order rank within each
    group, keep the first `cap`.  One shuffle on the group key; each
    group sorts on one task — correct and fine when the largest group
    fits an executor, the documented trade-off vs the threshold
    form."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("_sg_rn", F.row_number().over(w))
        .filter(F.col("_sg_rn") <= cap)
        .drop("_sg_rn")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    Efraimidis-Spirakis exponential-rank scheme): each row gets
    priority ln(u) / w for a hash-derived uniform u in (0,1), and the
    k LARGEST priorities are the sample — equivalent to sampling
    proportional to weight, but the randomness comes from md5 of the
    id, so the chosen set is a pure function of (ids, weights):
    reproducible on any cluster size and replayable by the SQL
    oracle, which seeded-RNG weighted sampling is not.

    Scale shape: a global top-k over a priority expression is
    TakeOrderedAndProject — per-partition heaps of size k merged on
    the driver, no global sort, no shuffle of the data.

    Rows with weight <= 0 (or NULL) are excluded: the
    Efraimidis-Spirakis scheme is defined for positive weights only,
    and engines diverge outside it (Spark's ln(u)/0 yields NULL —
    sorted last — while DuckDB yields -inf); the oracle mirrors the
    filter."""
    u = (hash_bucket(F.col(id_col), salt) + F.lit(0.5)) / F.lit(
        float(N_BUCKETS)
    )
    priority = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_priority", priority)
        .orderBy(F.col("_priority").desc(), F.col(id_col))
        .limit(k)
        .withColumn("priority", F.round("_priority", 6))
        .drop("_priority")
    )


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Add a `split` column assigning each row to one of `names` with
    the given weights — stable across runs, partitionings and engines
    (hash thresholds, not RNG)."""
    assert len(weights) == len(names)
    bucket = hash_bucket(F.col(id_col), salt)
    bounds, acc = [], 0.0
    for w in weights:
        acc += w
        bounds.append(int(round(acc * N_BUCKETS)))
    expr = None
    for name, hi in zip(names[:-1], bounds[:-1]):
        cond = bucket < hi
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    fractions: dict[str, float],
    target_ratio: float = 0.2,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-mixture construction: draw a deterministic sample
    whose GROUP COMPOSITION matches `fractions` (e.g. 50% en, 12.5%
    each for the rest), sized `target_ratio` of the corpus — the
    quota-sampling step that turns a crawl's natural skew into the
    mixture a training run actually wants.  Groups absent from
    `fractions` are excluded.  Output: (id, group) of the selected
    rows.

    Determinism/exactness: each group's quota is
    floor(corpus_count * target_ratio * fraction) — pure integer
    arithmetic off one corpus count — and membership is the quota
    prefix of the group's md5 order (rank by (md5(id), id)), so the
    selection is reproducible across runs, partitionings, and
    engines, unlike seeded RNG sampling.  Scale shape: one scan; the
    1-row corpus count attaches as a broadcast; the per-group rank is
    a WindowGroupLimit (rank <= quota cuts partial top-k per
    partition before the shuffle, so the full corpus is never
    window-sorted)."""
    from pyspark.sql import Window

    total = df.agg(F.count(F.lit(1)).alias("_total"))
    quota = F.create_map(
        *[
            x
            for g, frac in sorted(fractions.items())
            for x in (F.lit(g), F.lit(frac))
        ]
    )
    w = Window.partitionBy("_grp").orderBy("_h", "_id")
    return (
        df.select(
            F.col(id_col).alias("_id"), F.col(group_col).alias("_grp")
        )
        .filter(F.col("_grp").isin(*fractions.keys()))
        .crossJoin(F.broadcast(total))
        .withColumn("_h", F.md5(F.col("_id").cast("string")))
        .withColumn(
            "_quota",
            F.floor(
                F.col("_total") * F.lit(target_ratio) * quota[F.col("_grp")]
            ).cast("long"),
        )
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= F.col("_quota"))
        .select(
            F.col("_id").alias(id_col), F.col("_grp").alias(group_col)
        )
    )
