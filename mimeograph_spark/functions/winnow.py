"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
SIGMOD 2003 — the MOSS algorithm) and fingerprint-overlap pairs.

Winnowing selects, from the ORDERED sequence of k-gram hashes of a
document, the minimum hash inside every window of w consecutive
k-grams.  The selected set is position-robust: any shared substring of
length >= k + w - 1 between two documents is GUARANTEED to contribute
at least one common fingerprint, while the expected density of
selected hashes is only 2/(w+1) of all k-grams.  That guarantee is
what MinHash lacks — MinHash bounds the ESTIMATE of whole-document
similarity, winnowing bounds the DETECTION of local overlap, which is
the right tool for partial plagiarism / template reuse / quote-chain
detection in a training corpus.

Scale shape:
- Fingerprint selection is row-local — one projection of array HOFs
  (ordered k-gram hashes, sliding-window min, distinct), zero
  shuffles, whole-stage codegen end-to-end.  Cost O(m*w) per doc in
  expression form; w is a small constant (4-8).
- Because winnowing selects VALUES (the min per window), the
  tie-break rule that the paper needs for positional robustness
  (rightmost min) does not affect the selected value SET — so the
  distinct-fingerprint output is tie-break-free and bit-identical
  across engines.
- `winnow_pairs` reuses the df-capped inverted-index discipline of
  `dedup.containment_pairs`: explode fingerprints, drop fingerprints
  present in > max_df docs (boilerplate grams fan out quadratically
  while identifying nothing) or < 2 (cannot pair), per-fingerprint
  self-join, count shared per pair.  Pair space <= max_df *
  |postings| — linear in corpus size for fixed max_df, never
  O(n_docs^2).  The df filter is a semi-join against a
  vocabulary-sized frame, NOT a broadcast (the fingerprint vocabulary
  outgrows any broadcast budget at corpus scale).

Reference parity: the reference engine has no fingerprinting surface;
this is part of the training-data-pipeline extension the brief asks
for (document fingerprinting via rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import norm_tokens, shingle_hash


def kgram_hashes(toks: Column, k: int) -> Column:
    """ORDERED k-gram hash sequence of a token array (winnowing needs
    positions, so no distinct — contrast dedup.shingles_from_tokens).
    Fewer than k tokens yield a single whole-text gram so short docs
    still fingerprint."""
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return F.transform(grams, shingle_hash)


def winnow_select(hashes: Column, w: int) -> Column:
    """Distinct, sorted winnowing fingerprints of an ordered hash
    sequence: min of every length-w window; a sequence shorter than w
    contributes its global min (one degenerate window)."""
    m = F.size(hashes)
    wins = F.when(
        m >= w,
        F.transform(
            F.sequence(F.lit(0), m - w),
            lambda i: F.array_min(F.slice(hashes, i + 1, w)),
        ),
    ).otherwise(F.array(F.array_min(hashes)))
    return F.array_sort(F.array_distinct(wins))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Per-document winnowing fingerprints: (id, n_kgrams, fps) with
    fps a sorted distinct array<long>.  One zero-shuffle projection."""
    return df.select(
        F.col(id_col).alias("id"),
        # tokens staged as a real column: kgram_hashes slices the
        # token array inside its per-gram lambda, and HOFs are
        # interpreted — an inline tokenization re-runs per gram
        norm_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "id",
        kgram_hashes(F.col("_toks"), k).alias("_h"),
    ).select(
        "id",
        F.size("_h").cast("long").alias("n_kgrams"),
        winnow_select(F.col("_h"), w).alias("fps"),
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowing fingerprints —
    the MOSS match step.  Output (id_a, id_b, shared, n_fp_a, n_fp_b,
    overlap) with id_a < id_b and overlap = shared / min(n_fp) rounded
    to 6 (the containment analogue over fingerprint sets).  Pairs that
    share only df-capped fingerprints are missed — the same disclosed
    floor as the LSH bucket cap."""
    from pyspark.storagelevel import StorageLevel

    from ..cacheutil import ensure_compute_parallelism, register_persisted

    # The fingerprint frame feeds three consumers (df count + both
    # self-join sides): persist it so the expensive per-gram md5 +
    # window-min upstream runs once, and decouple that CPU-bound
    # stage from the input split count.  The persist sits BEFORE the
    # explode deliberately: explode makes the optimizer infer
    # `size(fps) > 0 AND isnotnull(fps)`, and with the explode on the
    # persist's build side predicate pushdown substitutes the ENTIRE
    # fingerprint expression into that filter and sinks it below the
    # widening repartition onto the raw scan — the cache build then
    # re-runs the whole tokenize+gram+window chain several times per
    # row on one task per input split (measured: 227 s cold vs 1.4 s
    # with the barrier at sf0.1).  An InMemoryRelation is a pushdown
    # barrier, so filtering/exploding AFTER it touches only the
    # cached fps attribute; re-deriving the explode per consumer is a
    # trivial array unnest of cached arrays.
    fp = winnow_fingerprints(
        ensure_compute_parallelism(df), id_col, text_col, k, w
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ex = fp.select(
        "id",
        F.size("fps").cast("long").alias("n_fp"),
        F.explode("fps").alias("h"),
    )
    keep = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select("h")
    )
    exk = ex.join(keep, "h", "left_semi")
    a, b = exk.alias("a"), exk.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_fp").alias("n_fp_a"),
            F.col("b.n_fp").alias("n_fp_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        pairs.filter(F.col("shared") >= min_shared)
        .select(
            "id_a",
            "id_b",
            "shared",
            "n_fp_a",
            "n_fp_b",
            F.round(
                F.col("shared") / F.least("n_fp_a", "n_fp_b"), 6
            ).alias("overlap"),
        )
    )
    return register_persisted(out, fp)
