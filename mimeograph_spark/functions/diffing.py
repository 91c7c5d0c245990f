"""Keyed snapshot diff — data-versioning support: given two corpus
snapshots, classify every key as added / removed / changed (unchanged
rows are NOT emitted — at 100 TB the diff is small and the identical
mass is the overwhelming majority, so emitting it would make the diff
as big as the corpus).

Scale shape: each side projects down to (key, md5-row-hash) BEFORE
the join, so the one shuffle carries a 32-char hash per row instead
of the full record; the full-outer join is a plain equi-join on the
key (bucket both snapshots by key and it is co-located).  Null-safe
hashing: every compare column passes through coalesce with a sentinel
and a unit-separator joiner, so ('a', NULL) never collides with
(NULL, 'a') or ('a', '').

Cited reference behavior: the reference re-runs jobs wholesale and
has no snapshot comparison (mimeograph.coffee:683-720 replays by job
id); this is the lineage/reproducibility generalization, companion to
`sources/checkpoint.py`'s time travel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL = "\x00<NULL>"


def row_hash(cols: list[str]) -> Column:
    """md5 over unit-separator-joined, null-sentineled string casts —
    the same expression the DuckDB oracle builds, so hashes agree
    across engines."""
    return F.md5(
        F.concat_ws(
            _SEP,
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
                for c in cols
            ],
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows that differ between `old` and `new`, keyed by `keys`:
    (keys..., status) with status in {'added', 'removed', 'changed'}.
    `compare_cols` defaults to every non-key column of `new`."""
    if not keys:
        raise ValueError("at least one key column required")
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    if not compare_cols:
        raise ValueError("no compare columns")
    o = old.select(*keys, row_hash(compare_cols).alias("_oh"))
    n = new.select(*keys, row_hash(compare_cols).alias("_nh"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.filter(
            F.col("_oh").isNull()
            | F.col("_nh").isNull()
            | (F.col("_oh") != F.col("_nh"))
        )
        .select(*keys, status.alias("status"))
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row per status INCLUDING 'unchanged', with counts — the
    cheap audit view (counts aggregate map-side; nothing row-sized
    leaves the executors)."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, row_hash(compare_cols).alias("_oh"))
    n = new.select(*keys, row_hash(compare_cols).alias("_nh"))
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        o.join(n, keys, "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
