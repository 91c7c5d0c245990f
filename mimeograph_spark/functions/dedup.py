"""Deduplication operators for training-data pipelines.

Exact, shingle-signature, MinHash+LSH, n-gram Jaccard, and SimHash —
all hot paths are pure built-in column expressions (JVM, codegen); no
Python UDFs, so they hold up at 100 TB.  Hashing is md5-based
everywhere because md5 is the one hash Spark and DuckDB share, keeping
every stage oracle-verifiable.

Scale notes:
- exact/shingle dedup: one hash-aggregate shuffle on the fingerprint —
  the minimal possible plan; AQE handles skewed fingerprint groups.
- MinHash LSH: signatures are narrow (per-row arrays); candidate
  generation shuffles once on (band, band_hash) — the standard
  banding trick, so no O(n^2) pair join ever materializes.  Bucket
  sizes are capped (`max_bucket`) so a degenerate bucket (e.g. empty
  docs) cannot produce a quadratic pair explosion on one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import fingerprint

# MinHash parameters: k permutations as (a, b) pairs over a Mersenne
# prime field; fixed constants (seeded once, hard-coded) so Spark and
# the DuckDB oracle agree bit-for-bit.
MINHASH_PRIME = 2147483647  # 2^31 - 1
_A0, _B0 = 1103515245, 12345  # LCG-style parameter generator


def minhash_params(k: int) -> list[tuple[int, int]]:
    params, a, b = [], _A0, _B0
    for _ in range(k):
        a = (a * 1103515245 + 12345) % MINHASH_PRIME
        b = (b * 69069 + 1) % MINHASH_PRIME
        params.append((a | 1, b))
    return params


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " "
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(
            F.array(F.array_join(toks, " "))
        )
    )


def shingle_hash(shingle: Column) -> Column:
    """Shingle -> uint32 via the first 8 hex chars of md5 (shared with
    DuckDB; Spark's own hash()/crc32 don't exist there)."""
    return F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("long")


def minhash_from_hashes(hs: Column, k: int = 16) -> Column:
    """k-element MinHash signature from an already-hashed shingle
    array: array_min over one cheap affine transform per permutation."""
    def permute(a: int, b: int):
        return lambda h: (h * a + b) % MINHASH_PRIME

    sigs = [
        F.array_min(F.transform(hs, permute(a, b)))
        for a, b in minhash_params(k)
    ]
    return F.array(*sigs)


def minhash_signature(text: Column, k: int = 16, n: int = 3) -> Column:
    """k-element MinHash signature of the shingle set.

    NOTE: inlines shingling+md5 into every permutation — use only for
    one-off expressions.  Query paths should project the hashed shingle
    array ONCE and call `minhash_from_hashes` (16x less md5 work; see
    with_minhash / lsh_candidate_pairs)."""
    hs = F.transform(shingles(text, n), shingle_hash)
    return minhash_from_hashes(hs, k)


def with_shingle_hashes(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "_hs"
) -> DataFrame:
    """Project the md5-hashed shingle array as a real column so
    downstream MinHash permutations reuse it instead of recomputing
    shingling+md5 per permutation (Catalyst's CollapseProject keeps the
    materialization because duplicating a non-cheap expression 16x is
    against its own cost rule)."""
    return df.withColumn(
        out, F.transform(shingles(F.col(text_col), n), shingle_hash)
    )


def with_minhash(df: DataFrame, text_col: str = "text", k: int = 16,
                 n: int = 3) -> DataFrame:
    staged = with_shingle_hashes(df, text_col, n)
    return staged.withColumn(
        "minhash", minhash_from_hashes(F.col("_hs"), k)
    ).drop("_hs")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band the signature, self-join on
    (band, band_hash), emit (id_a < id_b) pairs with their exact
    shingle-Jaccard.

    The candidate join shuffles only (id, band_hash, shingle-hash
    array) rows — never the O(n^2) pair space: only colliding band
    buckets produce join output, which is the whole point of banding.
    Jaccard reranking runs on uint32 shingle HASHES, not strings, so
    the intersect is cheap; AQE's skew-join splitting bounds a
    degenerate bucket (e.g. thousands of identical docs)."""
    rows = k // bands
    staged = with_shingle_hashes(df, text_col, n).select(
        F.col(id_col).alias("_id"),
        F.array_sort(F.array_distinct(F.col("_hs"))).alias("_sh"),
        minhash_from_hashes(F.col("_hs"), k).alias("_sig"),
    )
    banded = staged.select(
        "_id",
        "_sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("_sig"), b * rows + 1, rows),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        pairs.select(
            "id_a", "id_b", F.round(jac, 6).alias("jaccard")
        )
        .groupBy("id_a", "id_b")
        .agg(F.max("jaccard").alias("jaccard"))
    )


def ngram_jaccard(text_a: Column, text_b: Column, n: int = 3) -> Column:
    """Exact n-gram Jaccard similarity between two texts."""
    a, b = shingles(text_a, n), shingles(text_b, n)
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one
    hash-aggregate; keeps the minimum id as the canonical doc."""
    return (
        df.select(
            fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_id").alias("canonical_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def simhash64(text: Column, bits: int = 32) -> Column:
    """SimHash over whitespace tokens: per-bit vote of md5-derived
    token hashes, packed into a long.  Pure built-ins (aggregate over
    the token array per bit)."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")
    th = F.transform(toks, lambda t: shingle_hash(t))
    def vote_step(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    packed = F.lit(0).cast("long")
    for b in range(bits):  # bits is a plan-time constant
        mask = 1 << b
        vote = F.aggregate(th, F.lit(0), vote_step(mask))
        packed = packed.bitwiseOR(
            F.when(vote > 0, F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return packed


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    block_bits: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs: block on the top `block_bits` bits (one
    shuffle), compare within blocks, keep pairs within `max_hamming`.
    Blocking bounds the pair space the way LSH banding does."""
    sh = df.select(
        F.col(id_col).alias("_id"), simhash64(F.col(text_col), bits).alias("_sh")
    )
    blocked = sh.withColumn(
        "_block", F.shiftright("_sh", bits - block_bits)
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    hamming = F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh")))
    return (
        a.join(b, on="_block")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
