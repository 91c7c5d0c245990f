"""Text analysis for large-scale training-data pipelines: language-ID,
quality scoring, token counting, document fingerprinting.

All pure built-in column expressions (JVM-side, whole-stage codegen) —
no UDFs anywhere on this path, so a 100 TB corpus pays zero Python tax.
Every function is deliberately SQL-expressible so the DuckDB oracle can
replay it exactly (sql_oracles.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker words per language for the n-gram/stopword heuristic.  The
# testdata generator produces English-ish word salads regardless of its
# `lang` label, so this is a real scoring function over synthetic text,
# not a lookup of the label.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "los", "de"),
    "fr": ("le", "la", "les", "des"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (training-data token accounting)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    ).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word token estimate: alphanumeric runs + individual
    punctuation marks — the usual cheap proxy for BPE token counts.
    RE2-safe (no lookarounds) so the DuckDB oracle can replay it."""
    runs = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+"), 0))
    punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0))
    return (runs + punct).cast("long")


def punct_ratio(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^A-Za-z0-9\s]", "")
    return F.when(F.length(text) > 0,
                  (F.length(text) - F.length(no_punct)) / F.length(text)
                  ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    )
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punct noise
    + a sane stopword share (the Gopher/C4-style cheap filters)."""
    n = token_count(text)
    len_ok = F.when((n >= 5) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) > 0.01, F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return (len_ok + punct_ok + stop_ok) / F.lit(3.0)


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    toks = tokens(F.lower(text))
    out = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        score = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        out.append((lang, score))
    return out


def lang_id(text: Column) -> Column:
    """Pick the language whose marker words appear most often; ties and
    zero evidence resolve to 'und' (undetermined)."""
    scores = lang_scores(text)
    best_score = F.greatest(*[s for _, s in scores])
    winners = F.array(
        *[F.when(s == best_score, F.lit(lang)) for lang, s in scores]
    )
    n_winners = F.size(F.filter(winners, lambda w: w.isNotNull()))
    first_winner = F.array_compact(winners)[0]
    return F.when(
        (best_score > 0) & (n_winners == 1), first_winner
    ).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint over normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(normalized)


def quality_percentiles_by_lang(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Grouped-aggregate UDAF surface (`applyInPandas`): per-language
    document count, median/p90 quality, and mean token count.

    The percentiles use explicit rank formulas over the sorted values
    (median = mean of the two middle elements, p90 = element at index
    floor(0.9*(n-1))) rather than library interpolation, so the DuckDB
    oracle replays them bit-for-bit.  Arrow-batched grouped-map: each
    language group arrives as one pandas frame — the custom-UDAF shape
    Spark's built-ins can't express when the aggregate needs the whole
    sorted group."""
    import numpy as np
    import pandas as pd

    stats = with_textstats(df, text_col).select(
        "lang_pred", "quality", "n_tokens"
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(pdf["quality"].to_numpy())
        n = len(v)
        med = (v[(n - 1) // 2] + v[n // 2]) / 2.0
        p90 = v[(9 * (n - 1)) // 10]
        return pd.DataFrame(
            [
                {
                    "lang_pred": pdf["lang_pred"].iloc[0],
                    "n_docs": n,
                    "p50_quality": round(float(med), 6),
                    "p90_quality": round(float(p90), 6),
                    "avg_tokens": round(
                        float(int(pdf["n_tokens"].sum()) / n), 6
                    ),
                }
            ]
        )

    return stats.groupBy("lang_pred").applyInPandas(
        agg,
        "lang_pred string, n_docs long, p50_quality double, "
        "p90_quality double, avg_tokens double",
    )


def token_chunks_udtf_df(df: DataFrame, chunk_tokens: int = 10) -> DataFrame:
    """UDTF surface (Python table function + LATERAL join): explode
    each document into fixed-size token chunks — the context-window
    chunking step of a training-data pipeline.

    This exists to complete the UDF/UDAF/UDTF API triad — per-row
    Python is the slow path, so production chunking belongs in a
    built-in (`posexplode` over a sliced token array, which this
    result is verified against by the DuckDB oracle) or an
    Arrow-batched mapInPandas.  The UDTF form matters for API parity:
    it is what a user of a row-generating extension would reach for."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no int, chunk string")
    class TokenChunks:
        def eval(self, text):  # noqa: ANN001 - UDTF contract
            toks = text.split() if text is not None else []
            for i in range(0, len(toks), chunk_tokens):
                yield i // chunk_tokens, " ".join(toks[i : i + chunk_tokens])

    spark = df.sparkSession
    spark.udtf.register("token_chunks", TokenChunks)
    df.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_no, c.chunk "
        "FROM _udtf_docs d, LATERAL token_chunks(d.text) c"
    )


def with_textstats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text stats in one pass, with the tokenization STAGED: the
    naive composition (each ratio calling tokens()/punct_ratio()
    inline) leaves ~50 copies of the split/regex expressions in the
    fused projection after Catalyst collapses it — the regex then runs
    ~50x per row.  Staging `_toks`/`_ltoks` and the raw scalars as
    real columns keeps each regex to one evaluation (measured 4.7x on
    the sf0.1 bench); the arithmetic is unchanged expression-for-
    expression, so results stay bit-identical to the per-column
    helpers and the DuckDB oracle."""
    t = F.col(text_col)
    staged = df.select(
        "*",
        tokens(t).alias("_toks"),
        tokens(F.lower(t)).alias("_ltoks"),
    )
    n_toks = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size("_toks")
    ).cast("long")
    n_stop = F.size(F.filter("_ltoks", lambda x: x.isin(*STOPWORDS)))
    stop_raw = F.when(
        F.size("_ltoks") > 0, n_stop / F.size("_ltoks")
    ).otherwise(F.lit(0.0))
    score_cols = [
        F.size(
            F.filter("_ltoks", lambda x: x.isin(*markers))
        ).alias(f"_s_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    staged = staged.select(
        "*",
        n_toks.alias("_n_tokens"),
        punct_ratio(t).alias("_punct"),
        stop_raw.alias("_stop"),
        *score_cols,
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in langs])
    winners = F.array(
        *[
            F.when(F.col(f"_s_{lang}") == best, F.lit(lang))
            for lang in langs
        ]
    )
    n_winners = F.size(F.filter(winners, lambda w: w.isNotNull()))
    len_ok = F.when(
        (F.col("_n_tokens") >= 5) & (F.col("_n_tokens") <= 5000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    punct_ok = F.when(F.col("_punct") < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(F.col("_stop") > 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    return staged.select(
        *df.columns,
        F.col("_n_tokens").alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subword_tokens"),
        F.round("_punct", 6).alias("punct_ratio"),
        F.round("_stop", 6).alias("stopword_ratio"),
        F.round((len_ok + punct_ok + stop_ok) / F.lit(3.0), 6).alias(
            "quality"
        ),
        F.when(
            (best > 0) & (n_winners == 1), F.array_compact(winners)[0]
        ).otherwise(F.lit("und")).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def char_class_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-class distribution and its Shannon
    entropy — the cheap complement to the token-level quality scores:
    machine-generated or encoded junk (base64 blobs, hex dumps,
    digit-heavy tables) skews the lower/upper/digit/space/other class
    distribution long before token heuristics notice.

    Scale shape: pure whole-stage-codegen string expressions, zero
    shuffle, one pass.  Class counts are staged as real columns before
    the entropy projection (Catalyst inlines any expression referenced
    twice — the duplicated-expression disease).  The whitespace class
    is the EXPLICIT set [ \\t\\n\\r\\f] on both engines: Java's \\s
    includes \\x0B, RE2's does not, so a literal class is the only
    cross-engine-stable definition."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    staged = df.select(
        F.col(id_col),
        n.cast("long").alias("_n"),
        (n - F.length(F.regexp_replace(t, "[a-z]", "")))
        .cast("long")
        .alias("_lo"),
        (n - F.length(F.regexp_replace(t, "[A-Z]", "")))
        .cast("long")
        .alias("_up"),
        (n - F.length(F.regexp_replace(t, "[0-9]", "")))
        .cast("long")
        .alias("_di"),
        (n - F.length(F.regexp_replace(t, "[ \t\n\r\f]", "")))
        .cast("long")
        .alias("_sp"),
    ).withColumn(
        "_ot",
        F.col("_n") - F.col("_lo") - F.col("_up") - F.col("_di")
        - F.col("_sp"),
    )

    def ent_term(c):
        p = c / F.col("_n")
        return F.when(c > 0, -p * F.log(p)).otherwise(F.lit(0.0))

    entropy = F.when(
        F.col("_n") > 0,
        sum(
            (ent_term(F.col(c)) for c in ("_lo", "_up", "_di", "_sp", "_ot")),
            F.lit(0.0),
        ),
    ).otherwise(F.lit(0.0))
    ratio = lambda c: F.round(  # noqa: E731
        F.when(F.col("_n") > 0, F.col(c) / F.col("_n")).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    return staged.select(
        id_col,
        F.col("_n").alias("n_chars_total"),
        F.col("_lo").alias("n_lower"),
        F.col("_up").alias("n_upper"),
        F.col("_di").alias("n_digit"),
        F.col("_sp").alias("n_space"),
        F.col("_ot").alias("n_other"),
        F.round(entropy, 6).alias("class_entropy"),
        ratio("_di").alias("digit_ratio"),
        ratio("_up").alias("upper_ratio"),
    )


def quality_percentiles_by_lang_arrow(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Arrow-native grouped aggregate (`applyInArrow`, Spark 4's
    pandas-free grouped-map API): identical semantics to
    `quality_percentiles_by_lang`, but each language group arrives as
    a `pyarrow.Table` and never materializes a pandas frame — no
    index machinery, no object-dtype conversions, just columnar
    buffers.  Same explicit rank formulas, so the same DuckDB oracle
    verifies both implementations row-for-row."""
    import pyarrow as pa

    stats = with_textstats(df, text_col).select(
        "lang_pred", "quality", "n_tokens"
    )

    def agg(table: pa.Table) -> pa.Table:
        import numpy as np

        v = np.sort(table.column("quality").to_numpy(zero_copy_only=False))
        n = len(v)
        med = (v[(n - 1) // 2] + v[n // 2]) / 2.0
        p90 = v[(9 * (n - 1)) // 10]
        tok = int(
            np.sum(table.column("n_tokens").to_numpy(zero_copy_only=False))
        )
        return pa.table(
            {
                "lang_pred": [table.column("lang_pred")[0].as_py()],
                "n_docs": pa.array([n], pa.int64()),
                "p50_quality": [round(float(med), 6)],
                "p90_quality": [round(float(p90), 6)],
                "avg_tokens": [round(tok / n, 6)],
            }
        )

    return stats.groupBy("lang_pred").applyInArrow(
        agg,
        "lang_pred string, n_docs long, p50_quality double, "
        "p90_quality double, avg_tokens double",
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Perplexity-style junk signal: per-document mean token log-prob
    under the corpus's own unigram LM — the standard companion to the
    Gopher repetition rules (a doc whose tokens are all corpus-rare is
    noise/garble; one that's all stop-words is boilerplate).  Output:
    (doc_id, n_tokens, sum_micro, mean_logprob).

    Scale shape: ONE corpus scan (the exploded token frame is
    persisted and feeds both the vocabulary aggregation and the
    score join), vocabulary joined back via broadcast — vocab is
    Heaps-law sublinear in the corpus, the textbook broadcast side.
    Cross-engine exactness: each token's ln(count/total) is rounded
    to micro-nats and SUMMED AS INTEGERS, because FP summation order
    differs between engines while integer sums don't; the mean
    divides two exact integers at the end.  explode_outer keeps
    zero-token documents (NULL term rows survive the LEFT vocab
    join), so every input doc gets a row."""
    from pyspark import StorageLevel

    from ..cacheutil import register_persisted

    t = F.trim(F.lower(F.col(text_col)))
    toks = F.split(t, r"\s+")
    terms = df.select(
        F.col(id_col),
        F.explode_outer(
            F.when(F.length(t) == 0, F.array().cast("array<string>"))
            .otherwise(toks)
        ).alias("term"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    vocab = (
        terms.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    total = vocab.agg(F.sum("_cnt").alias("_tot"))
    vocab_p = (
        vocab.crossJoin(F.broadcast(total))
        .select(
            "term",
            F.round(
                F.log(F.col("_cnt") / F.col("_tot")) * 1000000, 0
            )
            .cast("long")
            .alias("_lp_micro"),
        )
    )
    out = (
        terms.join(F.broadcast(vocab_p), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count("term").alias("n_tokens"),
            F.coalesce(F.sum("_lp_micro"), F.lit(0))
            .cast("long")
            .alias("sum_micro"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_micro",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("sum_micro")
                    / (F.col("n_tokens") * F.lit(1000000.0)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mean_logprob"),
        )
    )
    return register_persisted(out, terms)


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Interpolated bigram-LM score: per-document mean log-prob of
    each bigram under p(w2|w1) = lam * c(w1 w2)/c(w1) +
    (1-lam) * c(w2)/T, the corpus's own Jelinek-Mercer-smoothed
    bigram model — a sharper perplexity-style junk signal than
    `unigram_logprob` (word-salad scores low even when every
    individual token is common).  Output: (doc_id, n_bigrams,
    sum_micro, mean_logprob).

    Scale shape: ONE corpus scan — the doc-level token-array frame is
    persisted and feeds both exploded streams (unigrams for the vocab
    counts, bigram pairs for the bigram counts AND the score join).
    The unigram vocab is Heaps-law sublinear and broadcast; the
    bigram count table is NOT broadcast — distinct bigrams grow much
    faster than the vocabulary, so the score join runs as a shuffled
    equi-join on (w1, w2), which AQE sizes at runtime.  Cross-engine
    exactness: per-bigram ln(p) is rounded to integer micro-nats and
    summed as integers (FP sum order differs between engines;
    integer sums don't).  explode_outer keeps docs with fewer than
    two tokens — they surface with n_bigrams = 0 and score 0.
    """
    from pyspark import StorageLevel

    from ..cacheutil import register_persisted

    t = F.trim(F.lower(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        F.when(F.length(t) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(t, r"\s+"))
        .alias("_tk"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    uni = (
        base.select(F.explode("_tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_c1"))
    )
    total = uni.agg(F.sum("_c1").alias("_tot"))

    sz = F.size(F.col("_tk"))
    pairs = base.select(
        F.col(id_col),
        F.explode_outer(
            F.when(
                sz >= 2,
                F.zip_with(
                    F.slice(F.col("_tk"), 1, sz - 1),
                    F.slice(F.col("_tk"), 2, sz - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(
                F.array().cast("array<struct<w1:string,w2:string>>")
            )
        ).alias("_bg"),
    ).select(
        id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
    )

    big = pairs.filter(F.col("w1").isNotNull()).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_c12")
    )
    # score one row per DISTINCT bigram: lam*(c12/c1) + (1-lam)*(c2/T),
    # identical operation order on both engines so the double rounds
    # to the same micro-nat integer
    scored = (
        big.join(
            F.broadcast(uni.select(F.col("term").alias("w1"),
                                   F.col("_c1").alias("_cw1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("term").alias("w2"),
                                   F.col("_c1").alias("_cw2"))),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    F.lit(lam) * (F.col("_c12") / F.col("_cw1"))
                    + F.lit(1.0 - lam) * (F.col("_cw2") / F.col("_tot"))
                )
                * 1000000,
                0,
            )
            .cast("long")
            .alias("_lp_micro"),
        )
    )

    out = (
        pairs.join(scored, ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count("w1").alias("n_bigrams"),
            F.coalesce(F.sum("_lp_micro"), F.lit(0))
            .cast("long")
            .alias("sum_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_micro",
            F.round(
                F.when(
                    F.col("n_bigrams") > 0,
                    F.col("sum_micro")
                    / (F.col("n_bigrams") * F.lit(1000000.0)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mean_logprob"),
        )
    )
    return register_persisted(out, base)


def trigram_backoff_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    train_filter=None,
) -> DataFrame:
    """Stupid-backoff trigram LM score (Brants et al. 2007): per doc
    the mean log-score of each trigram under

        S(w3|w1 w2) = c123/c12                   if the trigram is seen
                    = alpha * c23/c2             else if the bigram is
                    = alpha^2 * (c3+1)/(T+V)     else (Laplace unigram
                                                  floor; OOV-safe)

    with counts from the `train_filter` subset (None = whole corpus).
    Scoring held-out docs against a train split exercises the backoff
    chain on genuinely unseen n-grams — on its own training counts a
    corpus never backs off.

    Scale shape mirrors `bigram_logprob`: one persisted token-array
    scan feeds the train count tables and the eval trigram stream;
    the unigram vocab (Heaps-sublinear) broadcasts, the bigram and
    trigram count tables join shuffled on their keys (they outgrow
    any broadcast budget), and scoring touches each DISTINCT trigram
    once before the per-doc join.  Cross-engine exactness: per-trigram
    ln() rounds to integer micro-nats before the per-doc integer sum.
    Output: (doc_id, n_trigrams, sum_micro, mean_logprob)."""
    from pyspark import StorageLevel

    from ..cacheutil import register_persisted

    t = F.trim(F.lower(F.col(text_col)))
    base = df.select(
        F.col(id_col),
        F.when(F.length(t) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(t, r"\s+"))
        .alias("_tk"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    train = base.filter(train_filter) if train_filter is not None else base

    def trigrams(frame, with_id):
        sz = F.size(F.col("_tk"))
        pair = F.zip_with(
            F.slice(F.col("_tk"), 1, sz - 2),
            F.slice(F.col("_tk"), 2, sz - 2),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        tri = F.zip_with(
            pair,
            F.slice(F.col("_tk"), 3, sz - 2),
            lambda s, c: F.struct(
                s["w1"].alias("w1"), s["w2"].alias("w2"), c.alias("w3")
            ),
        )
        empty = F.array().cast(
            "array<struct<w1:string,w2:string,w3:string>>"
        )
        cols = [F.col(id_col)] if with_id else []
        ex = F.explode_outer if with_id else F.explode
        return frame.select(
            *cols,
            ex(F.when(sz >= 3, tri).otherwise(empty)).alias("_tg"),
        ).select(
            *([id_col] if with_id else []),
            F.col("_tg.w1").alias("w1"),
            F.col("_tg.w2").alias("w2"),
            F.col("_tg.w3").alias("w3"),
        )

    uni = (
        train.select(F.explode("_tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_c1"))
    )
    totals = uni.agg(
        F.sum("_c1").cast("long").alias("_tot"),
        F.count(F.lit(1)).cast("long").alias("_vsz"),
    )
    bi = (
        train.select(
            F.explode(
                F.when(
                    F.size("_tk") >= 2,
                    F.zip_with(
                        F.slice(F.col("_tk"), 1, F.size("_tk") - 1),
                        F.slice(F.col("_tk"), 2, F.size("_tk") - 1),
                        lambda a, b: F.struct(
                            a.alias("w1"), b.alias("w2")
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                )
            ).alias("_bg")
        )
        .select(F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("_cb"))
    )
    tri_counts = (
        trigrams(train, with_id=False)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("_ct"))
    )

    ev = trigrams(base, with_id=True)
    distinct_tg = ev.filter(F.col("w1").isNotNull()).select(
        "w1", "w2", "w3"
    ).distinct()
    a = float(alpha)
    scored = (
        distinct_tg.join(tri_counts, ["w1", "w2", "w3"], "left")
        .join(
            bi.select(
                F.col("w1"), F.col("w2"), F.col("_cb").alias("_c12")
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            bi.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("_cb").alias("_c23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            F.broadcast(
                uni.select(
                    F.col("term").alias("w2"), F.col("_c1").alias("_c2")
                )
            ),
            "w2",
            "left",
        )
        .join(
            F.broadcast(
                uni.select(
                    F.col("term").alias("w3"), F.col("_c1").alias("_c3")
                )
            ),
            "w3",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "w3",
            F.round(
                F.when(
                    F.col("_ct").isNotNull(),
                    F.log(F.col("_ct") / F.col("_c12")),
                )
                .when(
                    F.col("_c23").isNotNull(),
                    F.log(F.lit(a) * (F.col("_c23") / F.col("_c2"))),
                )
                .otherwise(
                    F.log(
                        F.lit(a * a)
                        * (
                            (F.coalesce(F.col("_c3"), F.lit(0)) + 1)
                            / (F.col("_tot") + F.col("_vsz"))
                        )
                    )
                )
                * 1000000,
                0,
            )
            .cast("long")
            .alias("_lp_micro"),
        )
    )
    out = (
        ev.join(scored, ["w1", "w2", "w3"], "left")
        .groupBy(id_col)
        .agg(
            F.count("w1").alias("n_trigrams"),
            F.coalesce(F.sum("_lp_micro"), F.lit(0))
            .cast("long")
            .alias("sum_micro"),
        )
        .select(
            id_col,
            "n_trigrams",
            "sum_micro",
            F.round(
                F.when(
                    F.col("n_trigrams") > 0,
                    F.col("sum_micro")
                    / (F.col("n_trigrams") * F.lit(1000000.0)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mean_logprob"),
        )
    )
    return register_persisted(out, base)


def zipf_fit(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Zipf's-law fit of the corpus term-frequency distribution: one
    row (n_terms, slope, intercept, r2) from an ordinary-least-squares
    regression of ln(frequency) on ln(rank).  A natural-language
    corpus sits near slope -1; a large deviation (flat slope =
    templated/boilerplate vocabulary, steep = degenerate repetition)
    is a cheap whole-corpus quality gate that catches generator bugs
    and crawler traps no per-document filter sees.

    Scale shape — the classic global-rank trap is avoided with the
    same two-phase ranking ids.py uses, specialized to (count, term):
    ranking the vocabulary with one row_number() OVER (ORDER BY cnt
    DESC) would collapse the vocabulary into ONE task.  Instead:

    1. term frequencies: one explode + map-side-combined groupBy
       (corpus-sized scan, vocabulary-sized result);
    2. count-CLASS sizes: groupBy(cnt) — a frame as small as the
       number of DISTINCT frequencies (hundreds even for billions of
       terms, since frequencies cluster);
    3. a running-sum window over that tiny class frame gives each
       class its starting rank offset (the only global window, over
       <= n_classes rows);
    4. broadcast-join offsets back and row_number() WITHIN each
       count-class (partitioned window, parallel) — rank = offset +
       within-class position, ties broken by term, so the rank
       assignment is a pure function of the term-frequency multiset.

    The OLS moments then reduce in one map-side-combined aggregate.
    Final stats rounded to 6 (FP sum-order barrier, same convention
    as bm25's round)."""
    from pyspark.sql import Window

    from .dedup import norm_tokens

    tf = (
        df.select(F.explode(norm_tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cls = tf.groupBy("cnt").agg(F.count(F.lit(1)).alias("_nc"))
    woff = Window.orderBy(F.col("cnt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = cls.select(
        "cnt",
        F.coalesce(F.sum("_nc").over(woff), F.lit(0))
        .cast("long")
        .alias("_off"),
    )
    win = Window.partitionBy("cnt").orderBy("term")
    ranked = tf.join(F.broadcast(off), "cnt").select(
        F.log(F.col("_off") + F.row_number().over(win)).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    mom = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cov / vx
    return mom.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            F.when(
                (vx > 0) & (vy > 0), cov * cov / (vx * vy)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("r2"),
    )
