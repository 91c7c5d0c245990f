"""Repetition-based quality signals (Gopher-rule family).

Pretraining corpora filter documents whose content is dominated by
repetition — boilerplate, keyword stuffing, templated spam.  The
published filters (Gopher / MassiveText, C4) measure the fraction of
a document covered by repeated n-grams; this module computes the
word-level variants that apply to single-line documents:

- ``uniq_token_frac``   — distinct tokens / total tokens
- ``top_bigram`` / ``top_bigram_count`` / ``top_bigram_frac`` —
  the most frequent word 2-gram (deterministic tie-break: highest
  count, then lexicographically greatest) and the fraction of bigram
  occurrences it accounts for
- ``dup_bigram_frac`` / ``dup_trigram_frac`` — fraction of n-gram
  occurrences whose n-gram appears more than once

Scale design: the per-doc token stats are pure array expressions
(``array_distinct``/``size`` — zero shuffle, whole-stage codegen);
the n-gram counts need grouping by (doc, gram), so bigrams and
trigrams are tagged and unioned BEFORE the aggregation — exactly one
shuffle for both gram orders, partitioned by (doc_id, kind, gram) so
no single document's grams concentrate on one task beyond its own
size.  Gram arrays are staged as real columns first (Catalyst inlines
any expression referenced twice — the duplicated-expression disease
measured at 3-5x on textstats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals; one shuffle on (doc, kind,
    gram) + one on doc for the final assembly."""
    t = F.trim(F.col(text_col))
    toks = F.split(t, r"\s+")
    staged = df.select(
        F.col(id_col),
        F.when(F.length(t) == 0, F.array().cast("array<string>"))
        .otherwise(toks)
        .alias("_toks"),
    ).withColumn("_n", F.size("_toks").cast("long"))

    n_pairs = F.greatest(F.col("_n") - 1, F.lit(0)).cast("int")
    n_tris = F.greatest(F.col("_n") - 2, F.lit(0)).cast("int")
    staged = staged.withColumn(
        "_bi",
        F.zip_with(
            F.slice("_toks", F.lit(1), n_pairs),
            F.slice("_toks", F.lit(2), n_pairs),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    staged = staged.withColumn(
        "_tri",
        F.zip_with(
            F.slice("_bi", F.lit(1), n_tris),
            F.slice("_toks", F.lit(3), n_tris),
            lambda g, c: F.concat_ws(" ", g, c),
        ),
    )

    doc_stats = staged.select(
        id_col,
        F.col("_n").alias("n_tokens"),
        F.round(
            F.when(
                F.col("_n") > 0,
                F.size(F.array_distinct("_toks")) / F.col("_n"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("uniq_token_frac"),
    )

    tagged = staged.select(
        id_col,
        F.explode(
            F.concat(
                F.transform(
                    "_bi", lambda g: F.struct(F.lit("bi").alias("kind"), g.alias("gram"))
                ),
                F.transform(
                    "_tri", lambda g: F.struct(F.lit("tri").alias("kind"), g.alias("gram"))
                ),
            )
        ).alias("kg"),
    ).select(id_col, F.col("kg.kind").alias("kind"), F.col("kg.gram").alias("gram"))

    counts = tagged.groupBy(id_col, "kind", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy(id_col, "kind").orderBy(
        F.col("cnt").desc(), F.col("gram").desc()
    )
    ranked = counts.withColumn("rn", F.row_number().over(w))
    per_kind = counts.groupBy(id_col, "kind").agg(
        F.sum("cnt").alias("total"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "dup_occ"
        ),
    )
    top_bi = (
        ranked.filter((F.col("kind") == "bi") & (F.col("rn") == 1))
        .select(
            id_col,
            F.col("gram").alias("top_bigram"),
            F.col("cnt").alias("top_bigram_count"),
        )
    )
    kind_frac = per_kind.groupBy(id_col).agg(
        *[
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("kind") == k,
                            F.col("dup_occ") / F.col("total"),
                        )
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias(name)
            for k, name in (
                ("bi", "dup_bigram_frac"),
                ("tri", "dup_trigram_frac"),
            )
        ],
        F.coalesce(
            F.max(F.when(F.col("kind") == "bi", F.col("total"))), F.lit(0)
        )
        .cast("long")
        .alias("_bi_total"),
    )

    out = (
        doc_stats.join(kind_frac, on=id_col, how="left")
        .join(top_bi, on=id_col, how="left")
        .select(
            id_col,
            "n_tokens",
            "uniq_token_frac",
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            F.coalesce("top_bigram_count", F.lit(0))
            .cast("long")
            .alias("top_bigram_count"),
            F.round(
                F.when(
                    F.col("_bi_total") > 0,
                    F.coalesce("top_bigram_count", F.lit(0))
                    / F.col("_bi_total"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("top_bigram_frac"),
            F.coalesce("dup_bigram_frac", F.lit(0.0)).alias(
                "dup_bigram_frac"
            ),
            F.coalesce("dup_trigram_frac", F.lit(0.0)).alias(
                "dup_trigram_frac"
            ),
        )
    )
    return out
