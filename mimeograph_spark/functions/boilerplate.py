"""Corpus-level boilerplate n-gram detection.

Web sources carry per-site boilerplate (navigation, footers, cookie
banners) that survives HTML extraction because it IS text; the
standard corpus-side catch is document frequency WITHIN a source — an
n-gram present in a large fraction of one site's documents is
template, not content.  (The HTML-side complement, link-density
block stripping, lives in functions/html_extract.py.)

Scale shape: one corpus scan; per-doc grams are array_distinct'd
BEFORE the explode so a gram repeated inside one document counts
once; document frequency is a (source, gram) aggregation whose
map-side partial combine collapses each partition's hits before the
shuffle; the per-source doc totals are a tiny broadcast; the final
top-k per source is a WindowGroupLimit (partial top-k per partition,
never a full sort).  Ordering uses the INTEGER doc count, not the FP
ratio, so ranking is exact on every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import norm_tokens, shingles_from_tokens


def boilerplate_ngrams(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 2,
    min_ratio: float = 0.2,
    top_k: int = 5,
) -> DataFrame:
    """Per `group_col`, the `top_k` word n-grams by document
    frequency among those present in at least `min_ratio` of the
    group's documents.  Output: (group, gram, n_docs, doc_ratio,
    rank) — rank by (n_docs desc, gram asc), deterministic."""
    # tokens staged as a real column: the gram lambda slices the
    # token array per gram, and HOFs are interpreted (no codegen
    # subexpression elimination) — an inline tokenization here
    # re-runs split/regexp once per gram (measured 7x slower)
    grams = df.select(
        F.col(group_col).alias("grp"),
        norm_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "grp",
        F.explode(
            shingles_from_tokens(F.col("_toks"), n, pad_short=False)
        ).alias("gram"),
    )
    dfreq = grams.groupBy("grp", "gram").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = F.broadcast(
        df.groupBy(F.col(group_col).alias("grp")).agg(
            F.count(F.lit(1)).alias("_n")
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("n_docs"), F.asc("gram"))
    return (
        dfreq.join(totals, "grp")
        .filter(F.col("n_docs") >= F.col("_n") * F.lit(min_ratio))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("grp").alias(group_col),
            "gram",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_docs") / F.col("_n"), 6).alias("doc_ratio"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
