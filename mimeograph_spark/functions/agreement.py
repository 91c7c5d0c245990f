"""Inter-signal agreement — Cohen's kappa between two binary quality
raters (rule-based filter vs classifier, old vs new heuristic).
Curation pipelines gate rule changes on kappa against the incumbent:
high raw agreement is meaningless when both raters say "keep" 95% of
the time, and kappa corrects for exactly that chance-agreement mass.

Scale shape: ONE map-side-combined aggregation over the corpus — the
confusion matrix is four conditional counts; po/pe/kappa are pure
arithmetic on the resulting single row.  Determinism: every input to
the FP expressions is an exact integer (marginals multiply as doubles,
exact below 2^53), and both engines evaluate the identical expression
tree, so round(6) agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binary_agreement(
    df: DataFrame, rater_a: Column, rater_b: Column
) -> DataFrame:
    """One row: (n, n11, n10, n01, n00, po, pe, kappa) for the two
    boolean rater columns.  kappa is 0.0 when pe == 1 (degenerate:
    both raters constant)."""
    a = rater_a.cast("boolean")
    b = rater_b.cast("boolean")

    def cnt(pred):
        return F.sum(F.when(pred, 1).otherwise(0)).cast("long")

    counts = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        cnt(a & b).alias("n11"),
        cnt(a & ~b).alias("n10"),
        cnt(~a & b).alias("n01"),
        cnt(~a & ~b).alias("n00"),
    )
    ma1 = F.col("n11") + F.col("n10")
    ma0 = F.col("n01") + F.col("n00")
    mb1 = F.col("n11") + F.col("n01")
    mb0 = F.col("n10") + F.col("n00")
    po = (F.col("n11") + F.col("n00")) / F.col("n")
    pe = (ma1.cast("double") * mb1 + ma0.cast("double") * mb0) / (
        F.col("n").cast("double") * F.col("n")
    )
    kappa = F.when(pe < 1.0, (po - pe) / (1.0 - pe)).otherwise(
        F.lit(0.0)
    )
    return counts.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )
