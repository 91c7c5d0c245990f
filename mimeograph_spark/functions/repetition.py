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

Scale design — ONE pass over the corpus, zero joins, zero persists:
the per-doc token stats (size/array_distinct — pure codegen) are
computed in the same projection that stages the gram arrays, then
ride along the exploded gram rows as narrow scalars, so the plan
never forks into a doc-stats branch that would re-scan the input
(round 3's audit found exactly that: 2 file scans).  ``explode_outer``
keeps gram-less documents (n < 2) as a single NULL-gram row, which is
what lets the doc anchor live inside the gram leg instead of a left
join.  The former top-bigram window is a ``max(struct(cnt, gram))``
aggregate — same (count desc, gram desc) tie-break, but it folds into
the per-(doc, kind) aggregation instead of adding a window over a
second consumer of the counts frame.  Net physical shape: 1 scan,
2 shuffles ((doc, kind, gram) then doc), pinned by
``tests/test_plans.py::test_repetition_stats_single_scan``.

Gram arrays are staged as real columns first (Catalyst inlines any
expression referenced twice — the duplicated-expression disease
measured at 3-5x on textstats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals; single corpus scan, one
    shuffle on (doc, kind, gram) + one on doc for the final pivot."""
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

    # Doc-level stats computed in the SAME projection, then carried on
    # every gram row (two narrow scalars) — no second consumer of
    # `staged`, hence no second scan of the input.
    staged = staged.withColumn(
        "_uniq",
        F.round(
            F.when(
                F.col("_n") > 0,
                F.size(F.array_distinct("_toks")) / F.col("_n"),
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )

    # explode_outer: a doc with no bigrams still emits one NULL-gram
    # row, so every doc survives to the final aggregation without a
    # separate anchor frame.
    tagged = staged.select(
        id_col,
        "_n",
        "_uniq",
        F.explode_outer(
            F.concat(
                F.transform(
                    "_bi",
                    lambda g: F.struct(
                        F.lit("bi").alias("kind"), g.alias("gram")
                    ),
                ),
                F.transform(
                    "_tri",
                    lambda g: F.struct(
                        F.lit("tri").alias("kind"), g.alias("gram")
                    ),
                ),
            )
        ).alias("kg"),
    ).select(
        id_col,
        "_n",
        "_uniq",
        F.col("kg.kind").alias("kind"),
        F.col("kg.gram").alias("gram"),
    )

    counts = tagged.groupBy(id_col, "kind", "gram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("_n").alias("_n"),
        F.max("_uniq").alias("_uniq"),
    )

    # Per (doc, kind): totals, duplicate occurrences, and the top gram
    # as max(struct(cnt, gram)) — struct ordering compares cnt first
    # then gram, i.e. the (count desc, gram desc) tie-break the former
    # row_number window used, without a second consumer of `counts`.
    per_kind = counts.groupBy(id_col, "kind").agg(
        F.sum("cnt").alias("total"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "dup_occ"
        ),
        F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("top"),
        F.max("_n").alias("_n"),
        F.max("_uniq").alias("_uniq"),
    )

    pivoted = per_kind.groupBy(id_col).agg(
        F.max("_n").alias("n_tokens"),
        F.max("_uniq").alias("uniq_token_frac"),
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
        F.max(F.when(F.col("kind") == "bi", F.col("top.gram"))).alias(
            "_top_bigram"
        ),
        F.max(F.when(F.col("kind") == "bi", F.col("top.cnt"))).alias(
            "_top_bigram_count"
        ),
    )

    return pivoted.select(
        id_col,
        "n_tokens",
        "uniq_token_frac",
        F.coalesce("_top_bigram", F.lit("")).alias("top_bigram"),
        F.coalesce("_top_bigram_count", F.lit(0))
        .cast("long")
        .alias("top_bigram_count"),
        F.round(
            F.when(
                F.col("_bi_total") > 0,
                F.coalesce("_top_bigram_count", F.lit(0))
                / F.col("_bi_total"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
        "dup_bigram_frac",
        "dup_trigram_frac",
    )
