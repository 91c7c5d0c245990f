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

from ..cacheutil import ensure_compute_parallelism, register_persisted


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


def lsh_sign_bits(vec_col_name: str, all_planes: list[list[float]]) -> Column:
    """Sign bits for ALL planes in one expression: a single
    `transform` over one foldable plane-matrix literal, one nested
    zip_with/aggregate lambda.  Semantically identical to calling
    `lsh_bucket` per plane set, but (a) the expression tree has 3
    lambdas TOTAL instead of one zip_with+aggregate pair PER plane,
    and (b) the whole thing is ONE F.expr round-trip instead of
    thousands of py4j calls building 48x64 F.lit literals — at 6
    tables x 8 planes the per-plane Column-API form spent ~9s of
    DRIVER time constructing the plan for a sub-second job.  The D
    suffix keeps each component a DOUBLE literal (a bare decimal is
    DECIMAL in Spark SQL and would change the arithmetic)."""
    mat = ",".join(
        "array(" + ",".join(f"{c!r}D" for c in plane) + ")"
        for plane in all_planes
    )
    return F.expr(
        f"transform(array({mat}), plane -> CASE WHEN "
        f"aggregate(zip_with({vec_col_name}, plane, (x, y) -> x * y), "
        "0.0D, (acc, v) -> acc + v) >= 0 THEN '1' ELSE '0' END)"
    )


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


def _flip_bits(bcol: Column, positions: set[int], n_planes: int) -> Column:
    """Bucket string with the sign bits at `positions` flipped."""
    parts = []
    for i in range(n_planes):
        c = F.substring(bcol, i + 1, 1)
        if i in positions:
            c = F.when(c == "1", F.lit("0")).otherwise(F.lit("1"))
        parts.append(c)
    return F.concat(*parts)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    n_planes: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    probe_radius: int = 1,
    n_tables: int = 1,
    table_seed: str = "lsh",
) -> DataFrame:
    """Approximate top-k: only corpus vectors sharing an LSH bucket
    with the query (in any table, within the probe radius) are
    scored.  Two independent recall knobs:

    - `probe_radius`: the query side probes every bucket within that
      Hamming distance of its own (radius 1: n+1 buckets; radius 2:
      1 + n + n(n-1)/2).  Query-side expansion only — the corpus
      side's shuffle volume is unchanged.
    - `n_tables`: L independent hyperplane sets; a neighbor is a
      candidate if ANY table co-buckets it (1-(1-p)^L recall lift).
      The corpus emits L bucket rows per vector MAP-SIDE (the probe
      join is broadcast, so no corpus shuffle grows), and duplicate
      candidates are collapsed with a distinct on the small
      (query_id, vec_id, cosine) triple before ranking.

    Measured on the bench corpus (near-uniform embeddings, the
    adversarial case): 1 table r2 -> recall 0.38 @ ~15% candidates;
    6 tables r1 -> recall 0.77 @ ~20% — multi-table union beats
    deeper multiprobe per candidate, and at this operating point the
    fixed-hyperplane path matches IVF's recall (0.75 @ ~30%) at a
    SMALLER candidate budget.  IVF remains the primary path when an
    index can be persisted (its probe is partition-pruned); LSH needs
    no training and no stored index — the right tool for one-shot
    sweeps."""
    import itertools

    from pyspark.sql import Window

    if n_tables <= 1:
        tbl_planes = [("", hyperplanes(dim, n_planes))]
    else:
        tbl_planes = [
            (f"{t}:", hyperplanes(dim, n_planes, seed=f"{table_seed}:{t}"))
            for t in range(n_tables)
        ]
    flat_planes = [pl for _p, planes in tbl_planes for pl in planes]
    cvec = F.col(vec_col).cast("array<double>")

    def table_bucket(ti: int, prefix: str) -> Column:
        # slice this table's bits out of the staged all-planes column
        b = F.array_join(
            F.slice(F.col("_bits"), ti * n_planes + 1, n_planes), ""
        )
        return F.concat(F.lit(prefix), b) if prefix else b

    cbuckets = [table_bucket(ti, p) for ti, (p, _pl) in enumerate(tbl_planes)]
    c = (
        corpus.select(
            F.col(id_col).alias("vec_id"), cvec.alias("_cvec")
        )
        .select(
            "vec_id",
            "_cvec",
            l2_norm(F.col("_cvec")).alias("_cn"),
            lsh_sign_bits("_cvec", flat_planes).alias("_bits"),
        )
        .select(
            "vec_id",
            "_cvec",
            "_cn",
            (
                F.explode(F.array(*cbuckets)) if len(cbuckets) > 1
                else cbuckets[0]
            ).alias("bucket"),
        )
    )

    # stage each table's base bucket as a REAL column before building
    # the flips: _flip_bits references the bucket string n_planes
    # times per flip, and Catalyst inlines (not CSEs) repeated
    # expressions
    qb = (
        queries.select(
            F.col(query_id_col).alias("query_id"), cvec.alias("_qvec")
        )
        .select(
            "query_id",
            "_qvec",
            l2_norm(F.col("_qvec")).alias("_qn"),
            lsh_sign_bits("_qvec", flat_planes).alias("_bits"),
        )
        .select(
            "query_id",
            "_qvec",
            "_qn",
            *[
                table_bucket(ti, "").alias(f"_b{ti}")
                for ti in range(len(tbl_planes))
            ],
        )
    )
    # the probe list is one F.expr string (mirrors _flip_bits'
    # per-character rebuild) — L*(1+flips) Column-API builds cost
    # hundreds of py4j round-trips of pure driver latency
    def flipped_sql(col: str, positions: set[int]) -> str:
        parts = []
        for i in range(1, n_planes + 1):
            ch = f"substr({col}, {i}, 1)"
            if i - 1 in positions:
                ch = f"(CASE WHEN {ch} = '1' THEN '0' ELSE '1' END)"
            parts.append(ch)
        return " || ".join(parts)

    flip_sets: list[set[int]] = [set()]
    if probe_radius >= 1:
        flip_sets += [{i} for i in range(n_planes)]
    if probe_radius >= 2:
        flip_sets += [
            {i, j} for i, j in itertools.combinations(range(n_planes), 2)
        ]
    probe_exprs = []
    for ti, (prefix, _planes) in enumerate(tbl_planes):
        for ps in flip_sets:
            e = f"_b{ti}" if not ps else f"({flipped_sql(f'_b{ti}', ps)})"
            probe_exprs.append(f"'{prefix}' || {e}" if prefix else e)
    q = F.broadcast(
        qb.select(
            "query_id", "_qvec", "_qn",
            F.explode(
                F.expr("array(" + ",".join(probe_exprs) + ")")
            ).alias("bucket"),
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
    if len(tbl_planes) > 1:
        # a pair co-bucketed in several tables scores identically in
        # each (cosine rounded to 6dp) — distinct collapses them
        scored = scored.distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _assign_cells(base: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid cell per corpus vector: broadcast cross join +
    map-side-combined max_by on (rounded cosine, lowest cid)."""
    sim = F.round(
        dot(F.col("_cvec"), F.col("_cent"))
        / (F.col("_cn") * F.col("_centn")),
        6,
    )
    return (
        base.crossJoin(cent)
        .select("vec_id", "_cvec", "_cn", "cid", sim.alias("_sim"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cid", "_cvec", "_cn"),
                F.struct(F.col("_sim"), (-F.col("cid")).alias("_nc")),
            ).alias("_best")
        )
        .select(
            "vec_id",
            F.col("_best.cid").alias("cid"),
            F.col("_best._cvec").alias("_cvec"),
            F.col("_best._cn").alias("_cn"),
        )
    )


def _kmeans_refine(
    base: DataFrame, cent: DataFrame, dim: int, iters: int
) -> DataFrame:
    """Lloyd iterations over the centroid set: assign -> per-cell
    elementwise mean (64 avg aggregates, all codegen) -> empty cells
    keep their old centroid.  Components are rounded to 6 decimals
    after every mean so the DuckDB oracle's averages (different
    summation order, last-bit FP wobble ~1e-15) land on the same grid.
    Each round costs one n x M broadcast cross join plus an M-row
    shuffle — the standard IVF index-build cost; the tiny centroid
    frame is localCheckpoint()ed per round so the lineage stays flat
    instead of nesting assignment plans iters deep."""
    for _ in range(iters):
        assigned = _assign_cells(base, cent)
        means = (
            assigned.groupBy("cid")
            .agg(
                *[
                    F.round(F.avg(F.col("_cvec")[i]), 6).alias(f"_m{i}")
                    for i in range(dim)
                ]
            )
            .select(
                "cid",
                F.array(*[F.col(f"_m{i}") for i in range(dim)]).alias(
                    "_mvec"
                ),
            )
        )
        cent = (
            cent.join(means, on="cid", how="left")
            .select(
                "cid", F.coalesce("_mvec", "_cent").alias("_cent")
            )
            .withColumn("_centn", l2_norm(F.col("_cent")))
            .localCheckpoint(eager=False)
        )
        cent = F.broadcast(cent)
    return cent


class IvfIndex:
    """Handle to a persisted IVF index: `path/centroids` (M rows:
    cid, centroid, norm) and `path/cells` (the corpus partitioned BY
    cid — one directory per Voronoi cell), plus `path/meta.json`
    recording the build parameters so a probe can't silently run with
    mismatched geometry."""

    def __init__(self, path: str, dim: int, n_centroids: int):
        self.path = path
        self.dim = dim
        self.n_centroids = n_centroids

    @property
    def centroids_path(self) -> str:
        return f"{self.path}/centroids"

    @property
    def cells_path(self) -> str:
        return f"{self.path}/cells"

    @classmethod
    def load(cls, path: str) -> "IvfIndex":
        import json

        with open(f"{path}/meta.json") as f:
            meta = json.load(f)
        return cls(path, meta["dim"], meta["n_centroids"])


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    centroid_step: int = 50,
    dim: int = 64,
    refine_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """Build and PERSIST an IVF index: the amortization half of IVF —
    the n x M assignment (the expensive part) is paid once at build
    time, and every subsequent query batch probes the stored cells.

    Layout: `cells` is written partitioned BY cid (one directory per
    Voronoi cell), so a probe physically reads only the nprobe cells
    it joins against — Spark's dynamic partition pruning turns the
    broadcast probe-set join into a partition filter on the scan
    (pinned by tests/test_plans.py::test_ivf_probe_prunes_cells).
    That is the IVF contract at 100 TB: query cost scales with
    nprobe/M of the index, not with the corpus.  The one shuffle here
    (repartition on cid before the write) is the index-build cost;
    it also gives one file per cell instead of tasks x cells
    fragments.  Vectors are stored as array<double> with their norms
    precomputed — probe-side scoring is a pure dot product."""
    import json
    import os

    from pyspark.storagelevel import StorageLevel

    cvec = F.col(vec_col).cast("array<double>")
    # base feeds every Lloyd round plus the final assignment — the
    # norms are an interpreted HOF fold per row, so re-deriving the
    # frame from the source per round pays the scan AND the fold
    # refine_iters + 1 times; one narrow cache pays them once.
    # ensure_compute_parallelism: the interpreted dot/norm folds in
    # every assignment round run one task per INPUT SPLIT — a
    # few-file corpus pins the whole Lloyd loop to as many cores
    # (no-op at real split counts; the 6-decimal mean rounding
    # absorbs the summation-order change, same as it already does
    # vs the oracle's ordering)
    base = ensure_compute_parallelism(
        corpus.select(F.col(id_col).alias("vec_id"), cvec.alias("_cvec"))
    ).withColumn("_cn", l2_norm(F.col("_cvec"))).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cent = F.broadcast(
        base.filter(F.col("vec_id") % centroid_step == 1).select(
            F.col("vec_id").alias("cid"),
            F.col("_cvec").alias("_cent"),
            F.col("_cn").alias("_centn"),
        )
    )
    if refine_iters > 0:
        cent = _kmeans_refine(base, cent, dim, refine_iters)
    cent_out = cent.select(
        "cid",
        F.col("_cent").alias("centroid"),
        F.col("_centn").alias("norm"),
    )
    cent_out.write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = _assign_cells(base, cent)
    (
        assigned.select(
            "vec_id",
            F.col("_cvec").alias("vec"),
            F.col("_cn").alias("norm"),
            "cid",
        )
        .repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(f"{path}/cells")
    )
    n_centroids = cent_out.count()
    base.unpersist()
    meta = {
        "dim": dim,
        "n_centroids": n_centroids,
        "centroid_step": centroid_step,
        "refine_iters": refine_iters,
    }
    tmp = f"{path}/meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{path}/meta.json")
    return IvfIndex(path, dim, n_centroids)


_CELLS_SCHEMA = (
    "vec_id BIGINT, vec ARRAY<DOUBLE>, norm DOUBLE, cid BIGINT"
)


def ivf_probe(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF index: score each query against only the
    `nprobe` cells whose centroids are nearest.

    Physical shape: the centroid table (M rows) is broadcast and
    crossed with the query batch to pick probe cells (an M x batch
    compute, trivial); the cell scan then joins the broadcast probe
    set on cid, and because `cells` is partitioned by cid, dynamic
    partition pruning restricts the scan to exactly the probed
    directories — the other M - nprobe cells are never read.  No
    assignment work happens here; that was paid at build time."""
    from pyspark.sql import Window

    spark = queries.sparkSession
    cent = F.broadcast(
        spark.read.parquet(index.centroids_path).select(
            "cid",
            F.col("centroid").alias("_cent"),
            F.col("norm").alias("_centn"),
        )
    )
    qvec = F.col(vec_col).cast("array<double>")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), qvec.alias("_qvec")
    ).withColumn("_qn", l2_norm(F.col("_qvec")))
    qsim = F.round(
        dot(F.col("_qvec"), F.col("_cent"))
        / (F.col("_qn") * F.col("_centn")),
        6,
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("_qsim"), F.asc("cid")
    )
    probes = F.broadcast(
        q.crossJoin(cent)
        .select("query_id", "_qvec", "_qn", "cid", qsim.alias("_qsim"))
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "_qvec", "_qn", "cid")
    )
    cells = spark.read.schema(_CELLS_SCHEMA).parquet(index.cells_path)
    scored = cells.join(probes, on="cid").select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("vec"), F.col("_qvec"))
            / (F.col("norm") * F.col("_qn")),
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


def ivf_topk(
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    centroid_step: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_modulus: int = 100,
    dim: int = 64,
    refine_iters: int = 0,
    index_path: str | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus
    into Voronoi cells around M centroids, score a query only against
    the `nprobe` cells whose centroids are nearest to it.

    On weakly-clustered embeddings this recall/candidate curve
    dominates hyperplane LSH (bench corpus: recall 0.58 at ~20% of
    the corpus scored with M = n/50, nprobe=8, vs 0.38 at ~15% for
    radius-2 LSH), because cell boundaries adapt to the data instead
    of being fixed random planes.

    Scale shape: centroids start as a deterministic corpus sample
    (id % centroid_step == 1), optionally refined by `refine_iters`
    Lloyd/k-means rounds (_kmeans_refine — measured +0.08 recall at
    equal candidate budget on the bench corpus with 3 rounds), kept
    BROADCAST; assignment is one broadcast cross join + a
    map-side-combined max_by per vector (the n x M dot products are
    the irreducible IVF assignment cost, all in whole-stage codegen,
    and the shuffle after partial aggregation carries only n rows).
    Queries come from the corpus itself
    (id % query_modulus == 0, the convention the other ANN queries
    use); probing joins the broadcast probe set on cell id, so the
    corpus shuffles once on its cell assignment.  M should grow
    ~sqrt(n) (at fixed nprobe the scored fraction shrinks as
    nprobe/M).

    With `index_path` set this COMPOSES the persisted-index pair —
    build_ivf_index() then ivf_probe() — so the driver-checked query
    exercises the same two-phase operator a 100 TB deployment runs
    (build once, probe per batch, cells partition-pruned to nprobe
    dirs).  Without it, the one-shot in-memory form (no disk writes)
    computes the identical result — the two paths share _assign_cells
    and _kmeans_refine, and the stored vectors/norms round-trip
    parquet doubles exactly."""
    from pyspark.sql import Window

    if index_path is not None:
        index = build_ivf_index(
            corpus,
            index_path,
            centroid_step=centroid_step,
            dim=dim,
            refine_iters=refine_iters,
            id_col=id_col,
            vec_col=vec_col,
        )
        queries = corpus.filter(F.col(id_col) % query_modulus == 0).select(
            F.col(id_col).alias("query_id"), vec_col
        )
        return ivf_probe(index, queries, k=k, nprobe=nprobe, vec_col=vec_col)

    cvec = F.col(vec_col).cast("array<double>")
    cent = F.broadcast(
        corpus.filter(F.col(id_col) % centroid_step == 1)
        .select(F.col(id_col).alias("cid"), cvec.alias("_cent"))
        .withColumn("_centn", l2_norm(F.col("_cent")))
    )
    base = corpus.select(
        F.col(id_col).alias("vec_id"), cvec.alias("_cvec")
    ).withColumn("_cn", l2_norm(F.col("_cvec")))
    if refine_iters > 0:
        cent = _kmeans_refine(base, cent, dim, refine_iters)
    assigned = _assign_cells(base, cent)
    q = base.filter(F.col("vec_id") % query_modulus == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("_cvec").alias("_qvec"),
        F.col("_cn").alias("_qn"),
    )
    qsim = F.round(
        dot(F.col("_qvec"), F.col("_cent"))
        / (F.col("_qn") * F.col("_centn")),
        6,
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("_qsim"), F.asc("cid")
    )
    probes = F.broadcast(
        q.crossJoin(cent)
        .select("query_id", "_qvec", "_qn", "cid", qsim.alias("_qsim"))
        .withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "_qvec", "_qn", "cid")
    )
    scored = assigned.join(probes, on="cid").select(
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


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    centroid_step: int = 50,
    dim: int = 64,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDedup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the same
    deterministic k-means the IVF family uses (centroid seed =
    ``id % centroid_step == 1``, Lloyd rounds with 6-decimal
    component rounding), then within each cluster mark every vector
    that has a cosine >= ``threshold`` neighbour with a SMALLER id as
    a semantic duplicate — the survivor of any near-identical group
    is its min-id member.  Output, one row per corpus vector:
    (vec_id, cid, is_dup).

    Scale shape: the all-pairs comparison is confined to each Voronoi
    cell — the SemDedup trick that turns O(n^2) into O(sum c_i^2) —
    and runs as a plain equi-join on cid (AQE skew-split applies; the
    dup set is collapsed to distinct ids before it touches the
    output, so no pair list survives the stage).  Assignment is the
    broadcast-centroid cross join shared with ``ivf_topk``; the
    staged base frame is persisted once (it feeds the centroid seed,
    every Lloyd round, and the final assignment — ONE corpus scan),
    and the assigned frame once for its three consumers (join left,
    join right, output spine).
    """
    cvec = F.col(vec_col).cast("array<double>")
    # widened for the same reason as build_ivf_index: the Lloyd
    # rounds' interpreted folds otherwise run one task per input
    # split (guarded no-op at real split counts)
    base = (
        ensure_compute_parallelism(
            corpus.select(F.col(id_col).alias("vec_id"), cvec.alias("_cvec"))
        )
        .withColumn("_cn", l2_norm(F.col("_cvec")))
        .persist()
    )
    cent = F.broadcast(
        base.filter(F.col("vec_id") % centroid_step == 1).select(
            F.col("vec_id").alias("cid"),
            F.col("_cvec").alias("_cent"),
            F.col("_cn").alias("_centn"),
        )
    )
    if refine_iters > 0:
        cent = _kmeans_refine(base, cent, dim, refine_iters)
    assigned = _assign_cells(base, cent).persist()
    right = assigned.select(
        F.col("vec_id").alias("_bid"),
        "cid",
        F.col("_cvec").alias("_bvec"),
        F.col("_cn").alias("_bn"),
    )
    sim = F.round(
        dot(F.col("_cvec"), F.col("_bvec")) / (F.col("_cn") * F.col("_bn")),
        6,
    )
    dup_ids = (
        assigned.select("vec_id", "cid", "_cvec", "_cn")
        .join(right, "cid")
        .filter(F.col("vec_id") < F.col("_bid"))
        .filter(sim >= threshold)
        .select(F.col("_bid").alias("vec_id"))
        .distinct()
        .withColumn("_isd", F.lit(True))
    )
    out = (
        assigned.join(dup_ids, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.coalesce(F.col("_isd"), F.lit(False)).alias("is_dup"),
        )
    )
    return register_persisted(out, base, assigned)


def embedding_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Centroid-distance outlier scoring — the embedding-space twin of
    the Gopher-style text quality rules: per row, the L2 distance to
    the corpus mean vector, its z-score against the corpus distance
    distribution, and an `is_outlier` flag at `z_threshold`.

    Plan shape: the narrow (id, vec) frame is persisted and feeds all
    three passes — the dim-sized mean-vector aggregation, the per-row
    distance map, and the 1-row (mu, sigma) aggregation — so the
    source is scanned once; the mean vector and the stats attach as
    broadcast 1-row crossJoins (never a collect).  FP determinism:
    mean components round to 6 before any distance math, the distance
    folds the array IN INDEX ORDER (zip_with + sequential aggregate —
    bit-identical to the oracle's list_transform + list_sum), and
    dist/mu/sigma are each rounded before the z ratio, so the final
    round(z, 4) sees identical doubles on both engines."""
    from pyspark.storagelevel import StorageLevel

    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    mvec = (
        base.select(F.posexplode("vec").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("s")
        )
        .select(
            F.transform(F.col("s"), lambda p: p["m"]).alias("mvec")
        )
    )
    dists = (
        base.crossJoin(F.broadcast(mvec))
        .select(
            "vec_id",
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            F.col("vec"),
                            F.col("mvec"),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                ),
                6,
            ).alias("dist"),
        )
        # narrow (id, double) frame with two consumers (stats + out):
        # persist so the distance map runs once
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = dists.agg(
        F.round(F.avg("dist"), 6).alias("mu"),
        F.round(F.stddev_pop("dist"), 6).alias("sigma"),
    )
    z = F.when(
        F.col("sigma") > 0,
        F.round((F.col("dist") - F.col("mu")) / F.col("sigma"), 4),
    ).otherwise(F.lit(0.0))
    out = (
        dists.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            "dist",
            z.alias("z"),
            (F.abs(z) >= F.lit(float(z_threshold))).alias("is_outlier"),
        )
    )
    return register_persisted(out, base, dists)


def _sq_l2(svv: Column, sv: Column, cent: Column, cc: Column) -> Column:
    """Squared L2 via the dot-product identity ||a||^2 - 2ab + ||b||^2
    with the norms STAGED (svv/cc): the three folds are the exact
    expression DuckDB's list_dot_product evaluates, so the unrounded
    double is bit-identical cross-engine (the direct (a-b)^2 fold has
    no DuckDB twin with guaranteed order)."""
    return svv - F.lit(2.0) * dot(sv, cent) + cc


def _pq_explode_sub(df: DataFrame, out_id: str, m: int, dsub: int) -> DataFrame:
    """(id, v) -> (id, s, sv, svv): one row per subspace with the
    subvector and its staged self-dot."""
    sv = F.slice(F.col("v"), F.col("s") * dsub + 1, dsub)
    return df.select(
        F.col(df.columns[0]).alias(out_id),
        F.explode(F.array([F.lit(s) for s in range(m)])).alias("s"),
        "v",
    ).select(
        out_id, "s", sv.alias("sv")
    ).withColumn("svv", dot(F.col("sv"), F.col("sv")))


def _pq_assign(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest sub-centroid per (vector, subspace): broadcast join
    against the m*ksub codebook + map-side-combined min_by argmin
    (round(d,6) + min-cid ties — the IVF determinism convention)."""
    d = F.round(
        _sq_l2(F.col("svv"), F.col("sv"), F.col("cent"), F.col("cc")), 6
    )
    return (
        sub.join(F.broadcast(cb), "s")
        .select("s", sub.columns[0], "sv", "cid", d.alias("_d"))
        .groupBy(sub.columns[0], "s")
        .agg(
            F.min_by(
                F.struct("cid", "sv"),
                F.struct(F.col("_d"), F.col("cid")),
            ).alias("_b")
        )
        .select(
            sub.columns[0], "s",
            F.col("_b.cid").alias("cid"),
            F.col("_b.sv").alias("sv"),
        )
    )


def _pq_train(
    sub: DataFrame, ksub: int, init_step: int, iters: int, dsub: int
) -> DataFrame:
    """Per-subspace Lloyd training over the exploded frame: codebook
    (s, cid, cent, cc), deterministic arithmetic init, round(6) means,
    empty cells keep their centroid, localCheckpoint per round."""
    cb = (
        sub.filter(
            (F.col(sub.columns[0]) % init_step == 1)
            & (F.col(sub.columns[0]) < init_step * ksub)
        )
        .select(
            "s",
            ((F.col(sub.columns[0]) - 1) / init_step)
            .cast("int")
            .alias("cid"),
            F.col("sv").alias("cent"),
            F.col("svv").alias("cc"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        means = (
            _pq_assign(sub, cb)
            .groupBy("s", "cid")
            .agg(
                *[
                    F.round(F.avg(F.col("sv")[i]), 6).alias(f"_m{i}")
                    for i in range(dsub)
                ]
            )
            .select(
                "s", "cid",
                F.array(*[F.col(f"_m{i}") for i in range(dsub)]).alias(
                    "_mvec"
                ),
            )
        )
        cb = (
            cb.join(means, ["s", "cid"], "left")
            .select(
                "s", "cid",
                F.coalesce("_mvec", "cent").alias("cent"),
            )
            .withColumn("cc", dot(F.col("cent"), F.col("cent")))
            .localCheckpoint(eager=False)
        )
    return cb


def _pq_adc_topk(
    codes: DataFrame,
    cb: DataFrame,
    qbase: DataFrame,
    rerank_base: DataFrame,
    m: int,
    dsub: int,
    shortlist: int,
    k: int,
) -> DataFrame:
    """ADC shortlist + exact cosine rerank: micro-int distance table
    per (query, subspace, centroid) broadcast against the codes table;
    only the |Q| x shortlist survivors ever touch full vectors."""
    from pyspark.sql import Window

    qsub = _pq_explode_sub(qbase, "query_id", m, dsub)
    qtab = (
        qsub.join(F.broadcast(cb), "s")
        .select(
            "query_id", "s", "cid",
            F.round(
                _sq_l2(
                    F.col("svv"), F.col("sv"), F.col("cent"), F.col("cc")
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("dmicro"),
        )
    )
    adc = (
        codes.join(
            F.broadcast(qtab),
            (codes["s"] == qtab["s"]) & (codes["code"] == qtab["cid"]),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dmicro").alias("adc_micro"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.asc("adc_micro"), F.asc("vec_id")
    )
    short = (
        adc.withColumn("_r", F.row_number().over(ws))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", "vec_id")
    )
    qn = F.broadcast(
        qbase.select("query_id", F.col("v").alias("_qv"))
        .withColumn("_qn", l2_norm(F.col("_qv")))
    )
    rr = (
        short.join(rerank_base, "vec_id")
        .withColumn("_cn", l2_norm(F.col("v")))
        .join(qn, "query_id")
        .select(
            "query_id", "vec_id",
            F.round(
                dot(F.col("v"), F.col("_qv"))
                / (F.col("_cn") * F.col("_qn")),
                6,
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        rr.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int = 64,
    m: int = 8,
    ksub: int = 32,
    init_step: int = 15,
    iters: int = 2,
    shortlist: int = 100,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Product-quantization ANN (Jegou/Douze/Schmid, PAMI 2011):
    per-subspace k-means codebooks -> m-byte codes per vector ->
    asymmetric-distance (ADC) shortlist -> exact cosine rerank.

    PQ is the MEMORY axis of the ANN trio: IVF prunes which
    PARTITIONS a query reads, LSH prunes which BUCKETS, PQ shrinks
    the per-vector bytes themselves — a 64-dim float vector (256 B
    raw) becomes m=8 small-int codes (8 B), so a corpus whose raw
    embeddings are 100 TB scans as ~3 TB of codes plus a broadcast
    codebook of m*ksub rows.  Measured on the bench corpus (sf0.1,
    2000 vecs): recall 0.79 vs exact top-5 at shortlist=100 (5%
    candidate budget) — above IVF's 0.75 @ ~30% and LSH's 0.77 @
    ~20%; curve: C=50 -> 0.66, C=100 -> 0.79, C=150 -> 0.87,
    C=200 -> 0.91.

    Plan shape:
    - training/encode: ONE exploded (vec_id, s, subvec) frame
      (persisted — it drives every Lloyd round and the final encode);
      each round is one broadcast join against the m*ksub-row
      codebook + one map-side-combined argmin (min_by, no window) +
      one componentwise-mean aggregate; codebook localCheckpointed
      per round.
    - ADC: the query distance table (|Q| * m * ksub rows) broadcasts
      against the CODES table only — the full vectors are never
      touched until the rerank, which joins just |Q| * shortlist ids
      back to the corpus.
    - determinism: k-means assignment uses round(d, 6) + min-cid
      ties (the IVF convention); ADC accumulates MICRO-INT distances
      (CAST(round(d*1e6) AS BIGINT)) so the per-query sum is
      order-free integer arithmetic — no FP-boundary flakes at the
      shortlist cut; centroid means rounded to 6 per round.

    This composes training + encode + query end-to-end (the driver
    query's honest shape); `build_pq_index` / `pq_probe` split the
    amortization — train+encode once, probe per batch.

    Output: (query_id, vec_id, cosine, rank) — the shared ANN shape,
    exact cosines of the reranked top-k."""
    from pyspark.storagelevel import StorageLevel

    if dim % m != 0:
        raise ValueError("dim must be divisible by m")
    dsub = dim // m

    # widened (guarded) so the Lloyd/encode rounds' interpreted
    # subvector folds parallelize past the input split count
    base = ensure_compute_parallelism(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sub = _pq_explode_sub(base, "vec_id", m, dsub).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cb = _pq_train(sub, ksub, init_step, iters, dsub)
    codes = _pq_assign(sub, cb).select(
        "vec_id", "s", F.col("cid").alias("code")
    )
    qbase = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).localCheckpoint(eager=False)
    out = _pq_adc_topk(codes, cb, qbase, base, m, dsub, shortlist, k)
    return register_persisted(out, base, sub)


class PqIndex:
    """Handle to a persisted PQ index: `path/codebook` (m*ksub rows:
    s, cid, cent, cc), `path/codes` (one (vec_id, s, code) row per
    vector-subspace — the 8-bytes-per-vector table every ADC scan
    reads INSTEAD of the raw embeddings), and `path/meta.json` pinning
    the build geometry so a probe can't silently run with mismatched
    m/dim/ksub."""

    def __init__(self, path: str, dim: int, m: int, ksub: int):
        self.path = path
        self.dim = dim
        self.m = m
        self.ksub = ksub

    @property
    def codebook_path(self) -> str:
        return f"{self.path}/codebook"

    @property
    def codes_path(self) -> str:
        return f"{self.path}/codes"

    @classmethod
    def load(cls, path: str) -> "PqIndex":
        import json

        with open(f"{path}/meta.json") as f:
            meta = json.load(f)
        return cls(path, meta["dim"], meta["m"], meta["ksub"])


def build_pq_index(
    corpus: DataFrame,
    path: str,
    dim: int = 64,
    m: int = 8,
    ksub: int = 32,
    init_step: int = 15,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PqIndex:
    """Train + encode once, persist: the amortization half of PQ.
    The expensive part (Lloyd rounds + final assignment over the full
    corpus) is paid at build time; every query batch afterwards reads
    the 32x-smaller codes table and the tiny codebook.  On a real
    cluster the codes table inherits the corpus's partitioning — the
    ADC scan is embarrassingly parallel and the per-query state is a
    broadcast distance table."""
    import json
    import os

    from pyspark.storagelevel import StorageLevel

    if dim % m != 0:
        raise ValueError("dim must be divisible by m")
    dsub = dim // m
    # widened (guarded): see pq_topk
    base = ensure_compute_parallelism(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    sub = _pq_explode_sub(base, "vec_id", m, dsub).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cb = _pq_train(sub, ksub, init_step, iters, dsub)
    cb.write.mode("overwrite").parquet(f"{path}/codebook")
    _pq_assign(sub, cb).select(
        "vec_id", "s", F.col("cid").alias("code")
    ).write.mode("overwrite").parquet(f"{path}/codes")
    sub.unpersist()
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/meta.json", "w") as f:
        json.dump({"dim": dim, "m": m, "ksub": ksub}, f)
    return PqIndex(path, dim, m, ksub)


def pq_probe(
    index: PqIndex,
    queries: DataFrame,
    corpus: DataFrame,
    shortlist: int = 100,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Steady-state PQ query against a persisted index: read the
    codebook (broadcast) and the codes table, ADC-shortlist, rerank
    exactly against `corpus` (point lookups of |Q| x shortlist ids —
    the only touch of full vectors).  Identical results to the
    composed pq_topk at the same geometry (pinned by test)."""
    spark = queries.sparkSession
    dsub = index.dim // index.m
    cb = spark.read.parquet(index.codebook_path)
    codes = spark.read.parquet(index.codes_path)
    qbase = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).localCheckpoint(eager=False)
    rerank_base = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    return _pq_adc_topk(
        codes, cb, qbase, rerank_base, index.m, dsub, shortlist, k
    )
