"""Incremental MinHash-LSH dedup against a persisted index.

At 100 TB you never re-run near-dup detection over the whole corpus
because 1% of new documents arrived.  The batch pipeline
(`dedup.lsh_candidate_pairs`) becomes a build/probe pair — the same
split `similarity.build_ivf_index`/`ivf_probe` uses for ANN:

- `build_lsh_index` runs ONCE over the existing corpus and persists
  three tables under a path: per-fingerprint canonicals (`fps`),
  canonical-rep signatures (`sigs`), and the banded bucket membership
  (`bands`, partitioned by band).
- `lsh_increment` dedups a NEW batch against the index AND itself
  while scanning the new batch only — the delta rides BROADCAST
  joins against the index tables, so the index is streamed through
  hash-join filters without ever being shuffled — then appends the
  batch's rows to the index so the next increment sees them.

Output contract (the equivalence the test pins): provided every new
id is greater than every indexed id (batches are newer crawls — ids
are monotone), the union of pairs over a build + a chain of
increments equals `lsh_candidate_pairs` over the full corpus
RESTRICTED to pairs that touch at least one new document.  The
bucket cap is evaluated against the COMBINED (index + delta) bucket
size — exactly the count the full run would see — but it is
emission-time only: pairs an earlier run emitted are never retracted
when a bucket later outgrows the cap (streaming caps are monotone).

Cited reference behavior: the reference has no incremental path at
all (each run is a full pass, mimeograph.coffee:683-720's job replay
re-reads everything); this module is the scale-out generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    band_hash_array,
    minhash_from_hashes,
    with_shingle_hashes,
)
from .textstats import fingerprint

# The persisted sigs table is hash-partitioned on id so each
# increment's rerank reads only the directories holding candidate
# ids (dynamic partition pruning through the broadcast semi-join)
# instead of the full corpus-sized table.  64 buckets keeps the
# directory fan-out sane while still pruning >90% of a large index
# for a small delta.
SIG_BUCKETS = 64


def _sig_bucket(col: F.Column) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(SIG_BUCKETS))


def _staged(
    df: DataFrame, id_col: str, text_col: str, k: int, n: int
) -> DataFrame:
    """(id, sh, sig): sorted-distinct shingle hashes + MinHash
    signature — the per-doc state the index stores for canonicals."""
    return with_shingle_hashes(df, text_col, n).select(
        F.col(id_col).alias("id"),
        F.array_sort(F.array_distinct(F.col("_hs"))).alias("sh"),
        minhash_from_hashes(F.col("_hs"), k).alias("sig"),
    )


def build_lsh_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> None:
    """Materialize the LSH dedup index for an existing corpus.
    Idempotent (mode=overwrite).  Tables:

    - ``{path}/fps``:   (fp, canon) — fingerprint -> canonical id
    - ``{path}/sigs``:  (id, sh, sig) for canonical reps only
    - ``{path}/bands``: (id, band_hash) partitioned by band
    """
    from pyspark.storagelevel import StorageLevel

    # ONE corpus scan: fingerprint + hashed shingles + signature are
    # projected together and persisted — the three table writes below
    # would otherwise each re-read the corpus and re-run the md5
    # shingling (the build's dominant per-row cost) from scratch.
    staged_all = with_shingle_hashes(df, text_col, n).select(
        F.col(id_col).alias("id"),
        fingerprint(F.col(text_col)).alias("fp"),
        F.array_sort(F.array_distinct(F.col("_hs"))).alias("sh"),
        minhash_from_hashes(F.col("_hs"), k).alias("sig"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    groups = (
        staged_all.groupBy("fp")
        .agg(F.min("id").alias("canon"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    groups.write.mode("overwrite").parquet(f"{path}/fps")

    reps = staged_all.join(
        groups.select(F.col("canon").alias("id")), "id", "left_semi"
    ).select("id", "sh", "sig").persist(StorageLevel.MEMORY_AND_DISK)
    reps.withColumn("sbkt", _sig_bucket(F.col("id"))).write.mode(
        "overwrite"
    ).partitionBy("sbkt").parquet(f"{path}/sigs")

    banded = reps.select(
        "id",
        F.posexplode(band_hash_array(F.col("sig"), k, bands)).alias(
            "band", "band_hash"
        ),
    )
    banded.write.mode("overwrite").partitionBy("band").parquet(
        f"{path}/bands"
    )
    staged_all.unpersist()
    groups.unpersist()
    reps.unpersist()


def lsh_increment(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    max_bucket: int = 64,
    update: bool | str = True,
) -> DataFrame | tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Near-dup pairs (id_a, id_b, jaccard) between the new batch and
    the indexed corpus plus within the new batch, id_a < id_b, exact
    matches at jaccard 1.0.  PRECONDITION: new ids all exceed indexed
    ids.  With ``update=True`` the batch is appended to the index
    (plain parquet append — NOT replay-safe on its own; a retry
    double-appends).  With ``update="defer"`` nothing is written:
    returns ``(pairs, fps_delta, sigs_delta, bands_delta)``, each an
    eager localCheckpoint severed from the live index, so the caller
    owns the commit and can make it idempotent (the streaming path's
    staged redo-log in `streaming/incremental_dedup.py` does).

    Scale shape: every join against an index table BROADCASTS the
    delta side — the index is scanned once per table, filtered in the
    hash join, never shuffled; the only shuffles are the delta's own
    aggregations.  The bucket cap sums stored bucket membership with
    the delta's, restricted to buckets the delta touches."""
    from pyspark.storagelevel import StorageLevel

    # the delta's (id, fp) projection rides FIVE+ consumers (both
    # exact stages, the hit-set broadcast, the miss anti-join, the
    # group aggregation) — without a persist every broadcast branch
    # re-scans and re-fingerprints the delta source from scratch
    new_fp = new_df.select(
        F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    idx_fps = spark.read.parquet(f"{path}/fps")

    # exact stage 1: new doc identical to an indexed fingerprint.
    # ONE streamed pass over the corpus-sized fps table feeds both the
    # exact pairs AND the delta-bounded hit set (its distinct fps) —
    # deriving the hit set from a second fps scan would double the
    # index read per increment.  The join output is bounded by the
    # delta, so caching it is scale-safe.
    hit_join = idx_fps.join(F.broadcast(new_fp), "fp").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    exact_old = hit_join.select(
        F.col("canon").alias("id_a"),
        F.col("id").alias("id_b"),
        F.lit(1.0).alias("jaccard"),
    )
    # exact stage 2: unseen fingerprints group within the batch.
    # The anti-join must NOT broadcast the corpus-sized fps table —
    # anti-join the delta against the tiny hit set instead (the index
    # is never broadcast; the AST pin in tests/test_plans.py checks
    # every F.broadcast argument here is delta-bounded).
    fp_hits = hit_join.select("fp").distinct()
    miss = new_fp.join(F.broadcast(fp_hits), "fp", "left_anti")
    new_groups = miss.groupBy("fp").agg(F.min("id").alias("canon"))
    if update:
        # sever the fps lineage NOW: appending to {path}/fps below
        # triggers refreshByPath, which invalidates every cache over
        # that file source — a lazy new_groups would then recompute
        # against the post-append table, see its own rows, and the
        # anti-join would erase the batch from the sigs/bands appends
        new_groups = new_groups.localCheckpoint(eager=True)
    exact_new = miss.join(new_groups, "fp").filter(
        F.col("id") != F.col("canon")
    ).select(
        F.col("canon").alias("id_a"),
        F.col("id").alias("id_b"),
        F.lit(1.0).alias("jaccard"),
    )

    # banding: canonical reps of the batch only
    staged_new = _staged(new_df, id_col, text_col, k, n).join(
        F.broadcast(new_groups.select(F.col("canon").alias("id"))),
        "id",
        "left_semi",
    )
    staged_new = staged_new.persist(StorageLevel.MEMORY_AND_DISK)
    banded_new = staged_new.select(
        "id",
        F.posexplode(band_hash_array(F.col("sig"), k, bands)).alias(
            "band", "band_hash"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    idx_bands = spark.read.parquet(f"{path}/bands")

    # combined bucket sizes, restricted to buckets the delta touches
    touched = banded_new.select("band", "band_hash").distinct()
    old_counts = idx_bands.join(F.broadcast(touched), ["band", "band_hash"]) \
        .groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("_oc"))
    new_counts = banded_new.groupBy("band", "band_hash").agg(
        F.count(F.lit(1)).alias("_nc")
    )
    keep = (
        new_counts.join(old_counts, ["band", "band_hash"], "left")
        .filter(
            F.coalesce(F.col("_oc"), F.lit(0)) + F.col("_nc") <= max_bucket
        )
        .select("band", "band_hash")
    )
    # capped_new feeds three consumers (the cand_old broadcast build
    # and both sides of the new-new self-join); without a persist each
    # one re-derives the cap, re-scanning the index bands table for
    # the combined bucket counts.  Delta-bounded, so safe to cache.
    capped_new = banded_new.join(
        F.broadcast(keep), ["band", "band_hash"], "left_semi"
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # candidates: index-vs-new (index streamed, delta broadcast) and
    # new-vs-new; precondition makes indexed id < new id
    cand_old = idx_bands.join(
        F.broadcast(capped_new.withColumnRenamed("id", "id_b")),
        ["band", "band_hash"],
    ).select(F.col("id").alias("id_a"), "id_b")
    a, b = capped_new.alias("a"), capped_new.alias("b")
    cand_new = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    cand = (
        cand_old.unionByName(cand_new)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # rerank with the stored/staged shingle arrays.  The sigs table
    # is corpus-sized; reading it whole per increment defeats the
    # incremental contract.  It is partitioned by sbkt (id hash), so
    # a broadcast semi-join on (sbkt, id) against the delta-bounded
    # candidate-id set dynamic-partition-prunes the scan to only the
    # directories that hold a candidate — same shape as the IVF
    # probe's plan-pinned pruning.
    # the between() is an invariant no-op (pmod lands in [0, B)) whose
    # real job is to satisfy DPP's isLikelySelective gate — without a
    # comparison predicate on the build side Spark skips inserting
    # the pruning subquery even for a free broadcast reuse
    need = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
        .withColumn("sbkt", _sig_bucket(F.col("id")))
        .filter(F.col("sbkt").between(0, SIG_BUCKETS - 1))
    )
    idx_sigs = spark.read.parquet(f"{path}/sigs").join(
        F.broadcast(need), ["sbkt", "id"], "left_semi"
    )
    sh_src = idx_sigs.select("id", "sh").unionByName(
        staged_new.select("id", "sh")
    )
    rerank = cand.join(
        sh_src.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
        "id_a",
    ).join(
        sh_src.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    scored = rerank.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))

    out = exact_old.unionByName(exact_new).unionByName(scored)

    if update == "defer":
        # materialize everything and hand the deltas to the caller —
        # no writes here, so a crashed caller can recompute from a
        # clean slate and a committed caller never re-enters
        out = out.localCheckpoint(eager=True)
        fps_delta = new_groups  # already an eager localCheckpoint
        sigs_delta = (
            staged_new.select("id", "sh", "sig")
            .withColumn("sbkt", _sig_bucket(F.col("id")))
            .localCheckpoint(eager=True)
        )
        bands_delta = banded_new.localCheckpoint(eager=True)
        new_fp.unpersist()
        hit_join.unpersist()
        staged_new.unpersist()
        banded_new.unpersist()
        capped_new.unpersist()
        cand.unpersist()
        return out, fps_delta, sigs_delta, bands_delta

    if update:
        # materialize the result BEFORE appending: the output plan
        # reads the index tables, and appending first would double
        # the probe side on any lazy re-execution
        out = out.localCheckpoint(eager=True)
        new_groups.write.mode("append").parquet(f"{path}/fps")
        staged_new.select("id", "sh", "sig").withColumn(
            "sbkt", _sig_bucket(F.col("id"))
        ).write.mode("append").partitionBy("sbkt").parquet(f"{path}/sigs")
        banded_new.write.mode("append").partitionBy("band").parquet(
            f"{path}/bands"
        )
        new_fp.unpersist()
        hit_join.unpersist()
        staged_new.unpersist()
        banded_new.unpersist()
        capped_new.unpersist()
        cand.unpersist()
        return out
    from ..cacheutil import register_persisted

    return register_persisted(
        out, new_fp, hit_join, staged_new, banded_new, capped_new, cand
    )
