"""Corpus composition / concentration analytics.

Training-mixture design starts from "who dominates the corpus": the
per-source share of documents and bytes, the Lorenz curve (cumulative
share of the largest sources), and a doc-level Gini coefficient of
document size — the single number that says whether 1% of documents
carry half the tokens (dedup/quota decisions hinge on it).

Scale shape: the per-source table aggregates map-side to |sources|
rows, so its window passes are bounded; the doc-level Gini uses the
rank-arithmetic identity G = 2*sum(i*w_i)/(n*sum(w)) - (n+1)/n over
ONE narrow (weight) sort — no pairwise |w_i - w_j| term, which would
be O(n^2).  sum(i*w_i), n and sum(w) are exact integers (BIGINT in,
row_number ranks), so the only FP op is the final ratio — identical
on both engines after round(6).  Ties in w get consecutive distinct
ranks; the tied group's rank-sum is order-invariant, so the statistic
is deterministic under any tie order.

Cited reference behavior: no analogue in the reference (it processes
documents one job at a time, mimeograph.coffee:131-210); this is
corpus-level curation support alongside functions/drift.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def source_concentration(
    docs: DataFrame,
    group_col: str = "source",
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source composition rows with an attached corpus-level
    doc-weight Gini: (source, n_docs, weight, share, cum_share, rank,
    gini).  `rank` orders sources by weight descending (ties by name)
    and `cum_share` is the Lorenz prefix — "the top k sources hold
    cum_share of the corpus"."""
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import register_persisted

    base = docs.select(
        F.col(group_col).alias("source"),
        F.col(weight_col).cast("long").alias("w"),
        F.col(id_col).alias("_id"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    per_source = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("weight"),
    )

    # doc-level Gini over w: ranks ascending by (w, _id) via the
    # two-phase scheme of functions/ids.py — a bare global
    # row_number() would collapse the corpus into one task.  Buckets
    # split the weight range arithmetically; only the <=n_buckets
    # offset frame ever sees a single-partition window.  The rank-sum
    # over a tied-weight group is invariant under tie order, so the
    # statistic is deterministic regardless of how ties land.
    n_buckets = 256
    lo_hi = base.agg(
        F.min("w").alias("_lo"), F.max("w").alias("_hi")
    ).first()
    lo = int(lo_hi["_lo"]) if lo_hi["_lo"] is not None else 0
    hi = int(lo_hi["_hi"]) if lo_hi["_hi"] is not None else 0
    step = max(1, -(-(hi - lo + 1) // n_buckets))
    staged = base.withColumn(
        "_bk", ((F.col("w") - F.lit(lo)) / F.lit(step)).cast("long")
    )
    wc = Window.orderBy("_bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        staged.groupBy("_bk")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "_bk",
            F.coalesce(F.sum("_n").over(wc), F.lit(0))
            .cast("long")
            .alias("_off"),
        )
    )
    wb = Window.partitionBy("_bk").orderBy(F.asc("w"), F.asc("_id"))
    gini = (
        staged.join(F.broadcast(offsets), "_bk")
        .select(
            "w",
            (F.row_number().over(wb) + F.col("_off"))
            .cast("long")
            .alias("i"),
        )
        .agg(
            F.sum(F.col("i") * F.col("w")).cast("long").alias("s_iw"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("w").cast("long").alias("s_w"),
        )
        .select(
            F.round(
                2.0 * F.col("s_iw") / (F.col("n") * F.col("s_w"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini")
        )
    )

    sw = Window.orderBy(F.desc("weight"), F.asc("source"))
    out = (
        per_source.crossJoin(F.broadcast(gini))
        .select(
            "source",
            "n_docs",
            "weight",
            "gini",
            F.row_number().over(sw).cast("long").alias("rank"),
            F.sum("weight").over(
                sw.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("_cum"),
        )
        .crossJoin(
            F.broadcast(per_source.agg(F.sum("weight").alias("_tot")))
        )
        .select(
            "source",
            "n_docs",
            "weight",
            "rank",
            F.round(F.col("weight") / F.col("_tot"), 6).alias("share"),
            F.round(F.col("_cum") / F.col("_tot"), 6).alias("cum_share"),
            "gini",
        )
    )
    return register_persisted(out, base)
