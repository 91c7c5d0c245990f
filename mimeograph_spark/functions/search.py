"""Corpus retrieval primitives: inverted postings and BM25 top-k.

A training-data pipeline needs targeted retrieval over the corpus it
is cleaning — "find every document containing these terms" powers
decontamination audits, eval-set leakage forensics, and topical
subset extraction.  Two primitives cover it:

- `inverted_postings`: term -> (df, sorted doc list).  One tokenize
  scan + one groupBy(term); the map-side partial aggregation bounds
  what a stop-word shuffles, and `min_df`/`max_postings` keep the
  output vocabulary-sized (Heaps' law: sublinear in the corpus).
  Written `partitionBy(hash-bucket)` downstream, point lookups prune
  to one bucket — same pattern as the IVF cell table.
- `bm25_topk`: Okapi BM25 scoring of a small term set against the
  whole corpus, top-k by score.  The query terms filter the exploded
  token stream BEFORE the (doc, term) aggregation, so the heavy
  groupBy only ever sees rows matching the query; corpus-level stats
  (N, avgdl) ride in as one broadcast scalar row; final selection is
  orderBy+limit — Spark plans TakeOrderedAndProject (per-partition
  heaps, no global sort).

Everything is codegen (split/explode/aggregate + one ln()); scores
are rounded to 6 decimals to absorb cross-engine libm ulp noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str):
    t = F.trim(F.col(text_col))
    return F.filter(F.split(t, r"\s+"), lambda x: F.length(x) > 0)


def inverted_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """(term, df, postings) — df = distinct docs containing the term,
    postings = their ids ascending.  Terms below `min_df` are dropped
    (hapaxes dominate raw vocabulary; keeping them doubles output
    size for terms no query will hit twice)."""
    pairs = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(text_col)).alias("term"),
        )
        .distinct()
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_sort(F.collect_list("doc_id")).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by Okapi BM25 over `terms` (OR semantics —
    any matching term contributes).  Output: (doc_id, n_hits, score),
    score desc / doc_id asc deterministic.

      idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
      score(d)     = sum_t idf(t) * tf * (k1+1)
                           / (tf + k1 * (1 - b + b * dl/avgdl))
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = df.select(
        F.col(id_col).alias("doc_id"), _tokens(text_col).alias("_tk")
    )
    dl = toks.select(
        "doc_id", F.size("_tk").alias("dl"), "_tk"
    )
    # corpus stats: one broadcast scalar row (never a collect)
    meta = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).alias("_n"),
            (F.sum("dl") / F.count(F.lit(1))).alias("_avgdl"),
        )
    )
    # query-term filter BEFORE the aggregation: the groupBy input is
    # only the matching (doc, term) rows, not the whole token stream
    tf = (
        dl.select(
            "doc_id", "dl", F.explode("_tk").alias("term")
        )
        .filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = F.broadcast(
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(meta)
        .withColumn(
            "_idf",
            F.log(
                1.0
                + (F.col("_n") - F.col("_df") + 0.5)
                / (F.col("_df") + 0.5)
            ),
        )
        .withColumn(
            "_part",
            F.col("_idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1
                * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.round(F.sum("_part"), 6).alias("score"),
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(k)
