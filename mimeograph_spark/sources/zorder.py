"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

Sorting a table by one column gives parquet min/max stats that prune
scans on THAT column and nothing else; queries filtering the second
dimension read everything.  Interleaving the bits of two columns into
one Morton key and range-partitioning + sorting by it makes every
file cover a small HYPER-RECTANGLE of the (a, b) space, so min/max
stats prune on either column — the layout Iceberg/Delta expose as
`rewrite_data_files(strategy => 'sort', sort_order => zorder(a, b))`.

The z-value is pure bit arithmetic (shift/and/or), whole-stage
codegen, zero Python; the layout write is one range shuffle + an
in-partition sort — the same cost as any global sort-write.  Pruning
is the reader's normal parquet row-group stats path; nothing custom
is needed at read time, which is the point: the layout pays once at
write, every engine that reads parquet benefits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low `bits` of two non-negative ints:
    bit i of `a` lands at position 2i, bit i of `b` at 2i+1."""
    a = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    bits: int = 16,
    n_tiles: int = 8,
) -> None:
    """Write `df` as parquet laid out along the Morton curve of
    (a_col, b_col): the top log2(n_tiles) bits of the z-value become
    the partition directory — each directory is EXACTLY one quadtree
    tile of the (a, b) space — and rows are z-sorted within it.  File
    min/max stats then bound BOTH columns per file by construction.

    Deterministic on purpose: `repartitionByRange(z)` would balance
    rows via SAMPLING, whose seed depends on plan identity — file
    boundaries (and thus which files straddle a major Morton jump)
    change run to run.  Top-bit tiling is a pure function of the
    data: reproducible layout, tile-aligned files, and the `_zf`
    partition column additionally gives directory-level pruning for
    z-range predicates.  Trade-off: tiles follow the KEY space, not
    the row count — heavily skewed (a, b) distributions get uneven
    tiles and should pre-map the keys (same caveat as ids.py's range
    buckets)."""
    k = n_tiles.bit_length() - 1
    if (1 << k) != n_tiles or k > 2 * bits:
        raise ValueError("n_tiles must be a power of two <= 4^bits")
    staged = df.withColumn(
        "_z", zvalue(F.col(a_col), F.col(b_col), bits)
    ).withColumn("_zf", F.shiftright("_z", 2 * bits - k))
    (
        staged.repartition(n_tiles, "_zf")
        .sortWithinPartitions("_zf", "_z")
        .drop("_z")
        .write.partitionBy("_zf")
        .mode("overwrite")
        .parquet(path)
    )
