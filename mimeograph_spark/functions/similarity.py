"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline.  Dot products run as
  built-in `aggregate(zip_with(...))` expressions (JVM, codegen) over a
  BROADCAST query set, so the big side streams once with no shuffle;
  top-k per query is a window over the (small) candidate set.
- Random-hyperplane LSH: the scale path.  Hyperplanes are fixed
  deterministic literals (seeded), bucket = sign-bit string; candidate
  generation shuffles once on the bucket key, then exact cosine
  re-ranks within buckets.  At 100 TB you'd persist the bucketed table
  (bucketBy on `bucket`) and probe it per query batch.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cacheutil import register_persisted


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of `corpus` rows per query row.

    Plan: broadcast the query set, one narrow pass over the corpus
    computing cosines, then a single shuffle for the per-query top-k
    (window row_number; Spark turns the rank filter into a partial
    top-k via TakeOrderedAndProject/WindowGroupLimit)."""
    from pyspark.sql import Window

    # float32 -> double BEFORE any arithmetic: keeps products and the
    # sequential accumulation bit-identical to the DuckDB oracle.
    # Norms are STAGED per row on each side — computed inline in the
    # cosine they would re-run per (corpus x query) pair, tripling the
    # per-pair aggregate work.
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qvec"),
        ).withColumn("_qn", l2_norm(F.col("_qvec")))
    )
    scored = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cvec"),
    ).withColumn("_cn", l2_norm(F.col("_cvec"))).crossJoin(q).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("_cvec"), F.col("_qvec"))
            / (F.col("_cn") * F.col("_qn")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: str = "mimeograph") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: each component derives
    from md5(seed:plane:dim) -> [-1, 1).  Stable across Spark, Python
    and the DuckDB oracle (planes are embedded as literals)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            (v,) = struct.unpack(">I", h[:4])
            row.append(v / 2147483648.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket string for a vector under the given planes."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(c) for c in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def embedding_near_dups(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 8,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket the corpus by
    hyperplane LSH, self-join within buckets only, keep pairs with
    cosine >= threshold.

    The same capped-bucket discipline as the text dedup operators: the
    pair space is bounded by bucket membership (never O(n^2)), and
    buckets above `max_bucket` are dropped before the self-join.  At
    `threshold` ~0.99 a true near-dup pair almost always shares its
    whole sign pattern, so single-bucket recall is high; lowering the
    threshold calls for multi-probe banding like `lsh_topk`."""
    from pyspark.sql import Window

    planes = hyperplanes(dim, n_planes)
    cvec = F.col(vec_col).cast("array<double>")
    b = corpus.select(
        F.col(id_col).alias("_id"),
        cvec.alias("_vec"),
        lsh_bucket(cvec, planes).alias("bucket"),
    ).withColumn("_n", l2_norm(F.col("_vec")))
    bucket_w = Window.partitionBy("bucket")
    # the sized frame feeds both self-join sides AND the
    # drop-accounting aggregate: persist so the 8-plane bucket
    # projection doesn't run twice over the corpus.
    from pyspark.storagelevel import StorageLevel

    from mimeograph_spark.functions.dedup import drop_stats

    sized = b.withColumn(
        "_bn", F.count(F.lit(1)).over(bucket_w)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    capped = sized.filter(F.col("_bn") <= max_bucket).drop("_bn")
    stats = drop_stats(sized, ["bucket"], max_bucket, "embedding_near_dups")
    a, c = capped.alias("a"), capped.alias("b")
    out = (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(
                dot(F.col("a._vec"), F.col("b._vec"))
                / (F.col("a._n") * F.col("b._n")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    from ..cacheutil import register_cap_stats

    return register_cap_stats(register_persisted(out, sized), stats)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    n_planes: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH
    bucket(s) are scored.  With `multi_probe` the query side also
    probes every bucket at Hamming distance 1 (each sign bit flipped
    once) — n_planes+1 buckets per query — which recovers most of the
    recall single-probe loses for vectors that land just across one
    hyperplane, while the corpus side stays a single bucketed pass.
    The probe expansion happens on the (broadcast) query side only, so
    the corpus shuffle volume is unchanged."""
    from pyspark.sql import Window

    planes = hyperplanes(dim, n_planes)
    cvec = F.col(vec_col).cast("array<double>")
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        cvec.alias("_cvec"),
        lsh_bucket(cvec, planes).alias("bucket"),
    ).withColumn("_cn", l2_norm(F.col("_cvec")))
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        cvec.alias("_qvec"),
        lsh_bucket(cvec, planes).alias("_b"),
    ).withColumn("_qn", l2_norm(F.col("_qvec")))
    if multi_probe:
        def flip(i: int):
            return F.concat(
                F.substring("_b", 1, i),
                F.when(
                    F.substring("_b", i + 1, 1) == "1", F.lit("0")
                ).otherwise(F.lit("1")),
                F.substring("_b", i + 2, n_planes),
            )

        probes = F.array(F.col("_b"), *[flip(i) for i in range(n_planes)])
    else:
        probes = F.array(F.col("_b"))
    q = F.broadcast(
        qb.select(
            "query_id", "_qvec", "_qn", F.explode(probes).alias("bucket")
        )
    )
    scored = c.join(q, on="bucket").select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("_cvec"), F.col("_qvec"))
            / (F.col("_cn") * F.col("_qn")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
