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
    n_files: int = 8,
) -> None:
    """Write `df` as parquet laid out along the Morton curve of
    (a_col, b_col): range-partition by z-value into ~n_files files,
    sort within each, drop the key.  File min/max stats then bound
    BOTH columns per file."""
    staged = df.withColumn("_z", zvalue(F.col(a_col), F.col(b_col), bits))
    (
        staged.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
