"""Corpus term statistics and TF-IDF term extraction.

Keyword extraction over a web-scale corpus is two aggregations and a
join — the interesting part is WHERE each one shuffles:

- term frequencies group by (doc, term): partitions are bounded by
  document size, never by term popularity;
- document frequencies group by term alone: a stop-word's row count
  is the corpus size, but the map-side partial aggregation (Spark
  always applies it for count-distinct-free aggs) collapses each
  partition's occurrences before the shuffle, so the hot term moves
  O(partitions) rows, not O(corpus);
- the tf table joins the df table on term — the df side is vocabulary
  -sized (sublinear in the corpus, Heaps' law), so AQE typically
  broadcasts it; nothing forces a hint either way.

IDF uses the smoothed form ln((N+1)/(df+1)) + 1 (scikit-learn's
convention) so unseen terms stay finite; scores are rounded to 6
decimals, which absorbs cross-engine libm ulp differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document (score desc, term asc —
    deterministic).  Output: (doc_id, term, tf, score, rank)."""
    t = F.trim(F.col(text_col))
    toks = F.split(t, r"\s+")
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.when(F.length(t) == 0, F.array().cast("array<string>"))
            .otherwise(toks)
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # document frequency: distinct docs per term — derived from the
    # tf table (already one row per (doc, term)), so no second pass
    # over the raw text
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = df.agg(F.countDistinct(id_col).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("_n") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", F.col("rank").cast("int"))
    )
