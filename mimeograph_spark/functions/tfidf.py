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

Physical shape: the tf frame feeds THREE consumers (the score join's
left side, the document-frequency aggregation, and the corpus doc
count), so it is persisted — without the cache Catalyst recomputes
the tokenize+explode lineage per branch and the corpus is scanned
three times (round 3's audit measured exactly that).  ``explode_outer``
keeps zero-term documents as a (doc, NULL) row inside tf, which is
what lets N (the IDF numerator) come from the cached frame instead of
a third scan of the raw input.  The cache is (doc, term, tf)-sized —
bounded by distinct terms per doc, far below the text itself — and is
registered on the returned frame for the caller-owned
``cacheutil.unpersist_deps`` lifecycle.  Pinned by
``tests/test_plans.py::test_tfidf_single_scan``.

IDF uses the smoothed form ln((N+1)/(df+1)) + 1 (scikit-learn's
convention) so unseen terms stay finite; scores are rounded to 6
decimals, which absorbs cross-engine libm ulp differences.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cacheutil import register_persisted


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
    # explode_outer: empty/NULL texts yield a (doc, NULL) row so the
    # doc still counts toward N below without re-touching the input.
    terms = df.select(
        F.col(id_col),
        F.explode_outer(
            F.when(F.length(t) == 0, F.array().cast("array<string>"))
            .otherwise(toks)
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    real = tf.filter(F.col("term").isNotNull())
    # document frequency: distinct docs per term — one row per
    # (doc, term) already, so a plain count per term
    dfreq = real.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = tf.agg(F.countDistinct(id_col).alias("_n"))
    scored = (
        real.join(dfreq, "term")
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
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", F.col("rank").cast("int"))
    )
    return register_persisted(out, tf)
