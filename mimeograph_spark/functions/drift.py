"""Distribution drift between two corpora — the train/serve-skew
detector: KL divergence (both directions), Jensen-Shannon, and total
variation over add-one-smoothed unigram distributions.

Scale shape: each corpus collapses to its term-count table in one
map-side-combined pass; the full-outer join of the two vocabularies
is Heaps-law sublinear in the corpora; everything after is arithmetic
on that joint table plus one scalar-row attach.  Nothing pairwise,
nothing quadratic.

Cross-engine exactness (the FP trap): KL = sum p*ln(p/q) is an
FP sum whose value depends on summation order.  With add-one
smoothing over the joint vocabulary, p = (ca+1)/A and q = (cb+1)/B
for INTEGER ca, cb, A = n_a+V, B = n_b+V — so every ratio inside a
logarithm is a ratio of integers:

    KL(p||q)  = (1/A) * sum (ca+1) * ln((ca+1)B / ((cb+1)A))
    p/m (JS)  = 2(ca+1)B / ((ca+1)B + (cb+1)A)
    TV        = sum |(ca+1)B - (cb+1)A| / (2AB)   -- exact integers

Each per-term logarithm is rounded to integer micro-nats and the
weighted sums run AS INTEGERS (order-free); TV's numerator is exact
integer arithmetic throughout.  Only the final scalar divisions are
floating point, rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1000000  # micro-nats


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """One row: (n_a, n_b, vocab, kl_ab, kl_ba, js, tv) between the
    two corpora's smoothed unigram distributions."""
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import register_persisted

    def counts(df: DataFrame, out: str) -> DataFrame:
        t = F.trim(F.lower(F.col(text_col)))
        return (
            df.select(
                F.explode(F.split(t, r"\s+")).alias("term")
            )
            .filter(F.col("term") != "")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(out))
        )

    joint = (
        counts(a, "_ca")
        .join(counts(b, "_cb"), "term", "full_outer")
        .select(
            "term",
            F.coalesce("_ca", F.lit(0)).alias("ca"),
            F.coalesce("_cb", F.lit(0)).alias("cb"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = joint.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    t = (
        joint.crossJoin(F.broadcast(totals))
        .withColumn("_A", F.col("n_a") + F.col("vocab"))
        .withColumn("_B", F.col("n_b") + F.col("vocab"))
        .withColumn("_pa", (F.col("ca") + 1) * F.col("_B"))
        .withColumn("_qa", (F.col("cb") + 1) * F.col("_A"))
    )
    ln_pq = (
        F.round(F.log(F.col("_pa") / F.col("_qa")) * _M, 0)
        .cast("long")
        .alias("_m_pq")
    )
    ln_pm = (
        F.round(
            F.log(
                2 * F.col("_pa") / (F.col("_pa") + F.col("_qa"))
            )
            * _M,
            0,
        )
        .cast("long")
        .alias("_m_pm")
    )
    ln_qm = (
        F.round(
            F.log(
                2 * F.col("_qa") / (F.col("_pa") + F.col("_qa"))
            )
            * _M,
            0,
        )
        .cast("long")
        .alias("_m_qm")
    )
    staged = t.select(
        "ca", "cb", "n_a", "n_b", "vocab", "_A", "_B",
        "_pa", "_qa", ln_pq, ln_pm, ln_qm,
    )
    sums = staged.groupBy("n_a", "n_b", "vocab", "_A", "_B").agg(
        F.sum((F.col("ca") + 1) * F.col("_m_pq"))
        .cast("long")
        .alias("_s_ab"),
        F.sum((F.col("cb") + 1) * (-F.col("_m_pq")))
        .cast("long")
        .alias("_s_ba"),
        F.sum((F.col("ca") + 1) * F.col("_m_pm"))
        .cast("long")
        .alias("_s_pm"),
        F.sum((F.col("cb") + 1) * F.col("_m_qm"))
        .cast("long")
        .alias("_s_qm"),
        F.sum(F.abs(F.col("_pa") - F.col("_qa")))
        .cast("long")
        .alias("_s_tv"),
    )
    out = sums.select(
        "n_a",
        "n_b",
        "vocab",
        F.round(F.col("_s_ab") / (F.col("_A") * _M), 6).alias("kl_ab"),
        F.round(F.col("_s_ba") / (F.col("_B") * _M), 6).alias("kl_ba"),
        F.round(
            0.5
            * (
                F.col("_s_pm") / (F.col("_A") * _M)
                + F.col("_s_qm") / (F.col("_B") * _M)
            ),
            6,
        ).alias("js"),
        F.round(
            F.col("_s_tv") / (2.0 * F.col("_A") * F.col("_B")), 6
        ).alias("tv"),
    )
    return register_persisted(out, joint)
