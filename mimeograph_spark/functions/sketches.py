"""Count-min sketch: fixed-memory frequency estimation.

The exact heavy-hitter profiler (`profile.heavy_hitters`) needs a
per-key count table — fine when the key space is sublinear, ruinous
when it is the open-ended token/URL space of a 100 TB crawl.  The
count-min sketch caps state at depth x width counters REGARDLESS of
key cardinality: each occurrence increments one bucket per hash row,
and an estimate reads the MINIMUM of a key's buckets — an upper
bound on the true count (collisions only ever inflate), within
eps * total with probability 1 - delta for width = e/eps, depth =
ln(1/delta).

Unlike the HLL rollup (`operators/hypertable.py`, rows-only checked
because Spark's Datasketches binaries are not DuckDB-replayable),
this sketch is built from explicit md5 hash rows, so every counter
and every estimate is bit-identical cross-engine — the full
value-hash oracle applies.

Scale shape: the build is ONE pass over the stream — each row
explodes into `depth` (row, bucket) pairs and a map-side-combined
groupBy collapses them to at most depth x width rows; a hot key's
billions of occurrences partial-aggregate per partition before the
shuffle.  Counter tables from disjoint corpus shards ADD cell-wise
(sketches are linear), so the build parallelizes like any sum.
Estimation joins the probe keys' bucket coordinates onto the counter
table (broadcast — it is depth x width rows by construction) and
takes min per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_array(key, depth: int, width: int):
    """Array of `depth` bucket indices for `key` — row d uses
    md5(d ":" key), the same family both engines evaluate."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(d), key)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            )
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Counter table (d, bucket, cnt) — at most depth x width rows,
    one occurrence-counting pass over the input."""
    return (
        df.select(
            F.posexplode(
                _bucket_array(F.col(key_col), depth, width)
            ).alias("d", "bucket")
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(key, cms_cnt) — min over the key's depth buckets; an upper
    bound on the true count.  `counters` is broadcast: it is bounded
    by depth x width whatever the corpus size."""
    probes = (
        keys.select(F.col(key_col).alias("key"))
        .distinct()
        .select(
            "key",
            F.posexplode(
                _bucket_array(F.col("key"), depth, width)
            ).alias("d", "bucket"),
        )
    )
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce("cnt", F.lit(0)))
            .cast("long")
            .alias("cms_cnt")
        )
    )


# --- Bloom filter -------------------------------------------------
#
# Set membership in O(m bits) regardless of set cardinality — the
# broadcast-bitset form of decontamination.  decontaminate()
# broadcasts the eval set's DISTINCT gram hashes (fine for benchmark
# sized eval sets); when the deny-set itself is huge (a blocklist of
# billions of grams/URLs), the bloom caps the broadcast at m bits
# with a quantified false-positive rate (~(1-e^(-kn/m))^k) and NO
# false negatives.  Words hold 32 bits each (bit 63 of a BIGINT
# overflows DuckDB's << and flips the sign in Spark — 32-bit masks
# stay positive and bit-identical on both engines).

BLOOM_WORD_BITS = 32


def _bloom_coords(key, k: int, m_bits: int):
    """Array of k (word_idx, mask) structs for `key` — hash row h
    uses md5(h ":" key), the same family as the count-min rows."""
    def pos(h: int):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(h), key)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % m_bits
        )

    return F.array(
        *[
            F.struct(
                (pos(h) / BLOOM_WORD_BITS).cast("long").alias("word_idx"),
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (pos(h) % BLOOM_WORD_BITS).cast("int"),
                ).alias("mask"),
            )
            for h in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str = "key",
    k: int = 4,
    m_bits: int = 1024,
) -> DataFrame:
    """Bitset as (word_idx, word) rows — at most m_bits/32 rows, one
    pass over the keys; word tables from disjoint shards OR together
    cell-wise, so the build distributes like any aggregation."""
    return (
        df.select(
            F.explode(
                _bloom_coords(F.col(key_col), k, m_bits)
            ).alias("c")
        )
        .groupBy(F.col("c.word_idx").alias("word_idx"))
        .agg(F.bit_or(F.col("c.mask")).alias("word"))
    )


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    k: int = 4,
    m_bits: int = 1024,
    carry: tuple = (),
) -> DataFrame:
    """(carry..., key, maybe_member) — true iff ALL k of the key's
    bits are set (no false negatives; false positives at the designed
    rate).  The word table is broadcast: it is bounded by m_bits
    whatever the deny-set size.  `carry` columns ride through the
    probe so composite keys (doc_id, gram) aggregate in ONE pass
    instead of probing distinct keys and shuffle-joining back."""
    coords = probes.select(
        *[F.col(c) for c in carry],
        F.col(key_col).alias("key"),
        F.explode(_bloom_coords(F.col(key_col), k, m_bits)).alias("c"),
    ).select(
        *carry,
        "key",
        F.col("c.word_idx").alias("word_idx"),
        F.col("c.mask").alias("mask"),
    )
    return (
        coords.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy(*carry, "key")
        .agg(
            F.min(
                (
                    F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(
                        F.col("mask")
                    )
                    == F.col("mask")
                ).cast("int")
            ).cast("boolean").alias("maybe_member")
        )
    )
