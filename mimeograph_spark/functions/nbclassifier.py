"""Multinomial Naive Bayes text classifier, trained and applied
in-corpus — the classic source/quality classifier shape of large-scale
training-data pipelines (CCNet / GPT-3-style "looks like wikiref"
scoring, fastText LID): token counts per class become smoothed
log-likelihood weights, and every document is scored against every
class in one pass.

Cross-engine exactness follows the unigram_logprob convention: every
log term is rounded to integer micro-nats BEFORE summation (FP sums
are order-dependent across engines; integer sums are not), so scores,
argmaxes, and tie-breaks are bit-identical in Spark and DuckDB.

Math: with Laplace smoothing, ln P(d|c) decomposes as
``sum_t ln(cnt(t,c)+1) - n_d * ln(tok_c + V)`` — the first sum only
needs rows for (term, class) pairs SEEN in class c (an unseen pair
contributes ln(1) = 0), which is what makes the weight table sparse
and the score join an equi-join on the token stream, never a dense
vocab x class product against the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = 1_000_000


def nb_train_predict(
    df: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train a multinomial NB classifier on (text, label) and score
    every document against every class; output one row per document:
    (id, label, pred, correct, score_micro) where pred is the argmax
    class (ties to the lexicographically smallest class — exact,
    because scores are integers) and score_micro its integer
    micro-nat log-posterior.

    Scale shape: ONE corpus scan — the exploded token frame is
    persisted and feeds the doc spine, the vocabulary size, the
    per-class token totals, and the (term, class) count table; the
    weight table (vocab x seen-classes, Heaps-law sublinear) and the
    class summary (n_classes rows) broadcast; per-(doc, class)
    partial sums shuffle once on the doc id.  No window over the
    corpus; the argmax is a min_by aggregate, not a rank.
    """
    from pyspark import StorageLevel

    from ..cacheutil import register_persisted

    t = F.trim(F.lower(F.col(text_col)))
    toks = F.split(t, r"\s+")
    terms = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        F.explode_outer(
            F.when(F.length(t) == 0, F.array().cast("array<string>"))
            .otherwise(toks)
        ).alias("term"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tokens = terms.filter(F.col("term").isNotNull())

    docs = terms.groupBy("_id", "_lbl").agg(
        F.count("term").cast("long").alias("_nd")
    )
    totals = F.broadcast(
        docs.agg(F.count(F.lit(1)).alias("_tdocs")).crossJoin(
            tokens.agg(F.count_distinct("term").alias("_v"))
        )
    )
    cls_docs = docs.groupBy(F.col("_lbl").alias("_cls")).agg(
        F.count(F.lit(1)).alias("_cdocs")
    )
    cls_toks = tokens.groupBy(F.col("_lbl").alias("_cls")).agg(
        F.count(F.lit(1)).alias("_ctoks")
    )
    classes = F.broadcast(
        cls_docs.join(cls_toks, "_cls", "left")
        .crossJoin(totals)
        .select(
            "_cls",
            F.round(F.log(F.col("_cdocs") / F.col("_tdocs")) * _M, 0)
            .cast("long")
            .alias("_prior"),
            F.round(
                F.log(
                    (F.coalesce(F.col("_ctoks"), F.lit(0)) + F.col("_v"))
                    .cast("double")
                )
                * _M,
                0,
            )
            .cast("long")
            .alias("_z"),
        )
    )
    weights = F.broadcast(
        tokens.groupBy("term", F.col("_lbl").alias("_cls"))
        .agg(F.count(F.lit(1)).alias("_tc"))
        .select(
            "term",
            "_cls",
            F.round(F.log((F.col("_tc") + 1).cast("double")) * _M, 0)
            .cast("long")
            .alias("_w"),
        )
    )
    per_dc = (
        tokens.select("_id", "term")
        .join(weights, "term")
        .groupBy("_id", "_cls")
        .agg(F.sum("_w").alias("_sw"))
    )
    scored = (
        docs.crossJoin(classes)
        .join(per_dc, ["_id", "_cls"], "left")
        .select(
            "_id",
            "_lbl",
            "_cls",
            (
                F.col("_prior")
                + F.coalesce(F.col("_sw"), F.lit(0))
                - F.col("_nd") * F.col("_z")
            )
            .cast("long")
            .alias("_score"),
        )
    )
    out = (
        scored.groupBy("_id", "_lbl")
        .agg(
            F.min_by(
                F.struct(
                    F.col("_cls").alias("c"), F.col("_score").alias("s")
                ),
                F.struct(
                    (-F.col("_score")).alias("ns"), F.col("_cls").alias("c")
                ),
            ).alias("_best")
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_lbl").alias(label_col),
            F.col("_best.c").alias("pred"),
            (F.col("_best.c") == F.col("_lbl")).alias("correct"),
            F.col("_best.s").alias("score_micro"),
        )
    )
    return register_persisted(out, terms)


def classifier_eval(
    preds: DataFrame,
    label_col: str = "lang",
    pred_col: str = "pred",
) -> DataFrame:
    """Per-class evaluation of a (label, pred) frame: one row per
    class appearing as truth or prediction — (label, n_true, n_pred,
    tp, precision, recall, f1), floats rounded to 6.  The measurement
    half of any quality-classifier deployment: per-class drift here
    is the canary that a retrained filter started eating a language.

    Scale shape: three map-side-combined aggregations over the
    class vocabulary (truth counts, prediction counts, diagonal
    counts) joined on the class key — every frame after the first
    scan is vocabulary-sized, no windows, no collects.  0/0 guards:
    precision is 0 when the class is never predicted, recall 0 when
    it never occurs; f1 0 when both are 0."""
    from pyspark import StorageLevel

    from ..cacheutil import register_persisted

    # four consumers (truth counts, prediction counts, diagonal,
    # class list) — without the persist each one re-executes the
    # entire upstream prediction pipeline (for nb_train_predict
    # input that is the full score-join, four times over)
    t = preds.select(
        F.col(label_col).alias("label"), F.col(pred_col).alias("p")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_true = t.groupBy("label").agg(F.count(F.lit(1)).alias("n_true"))
    n_pred = t.groupBy(F.col("p").alias("label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    tp = (
        t.filter(F.col("label") == F.col("p"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    # class list + three LEFT equi-joins rather than a FULL OUTER
    # join: Spark plans a small-side full outer as a
    # BroadcastNestedLoopJoin (flagged by the plan audit), while the
    # left joins stay hash joins on the class key.
    classes = (
        t.select("label")
        .unionByName(t.select(F.col("p").alias("label")))
        .distinct()
    )
    base = (
        classes.join(n_true, "label", "left")
        .join(n_pred, "label", "left")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("n_true") > 0, F.col("tp") / F.col("n_true")
    ).otherwise(F.lit(0.0))
    out = base.select(
        "label", "n_true", "n_pred", "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(
                (prec + rec) > 0, 2 * prec * rec / (prec + rec)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("f1"),
    )
    return register_persisted(out, t)
