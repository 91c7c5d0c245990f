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
