"""Page-layout analysis: reading-order reconstruction from word
geometry.

The reference's hOCR chain parses word boxes but never needs their
geometry — its fixture pages are single-column, so concatenating
`ocrx_word` hits in markup order suffices (patched_pdfbeads.rb keeps
boxes only to place the text layer).  Real PDF/layout parsing — the
north rule names it explicitly — must RECOVER the reading order when
word records arrive unordered and the page may be multi-column:
sorting plain (y, x) interleaves the columns of a two-column page
into nonsense.

Operator: per document,

1. detect the column split: the largest horizontal gap between
   distinct word-center x positions; a gap >= `min_gap` (in page
   units) splits the page into two columns at the gap's midpoint —
   the classic recursive X-Y cut, one level deep;
2. assign each word a column, then order by (column, y, x) and emit
   a dense `seq`.

Everything is windows + one aggregate + a doc-keyed join: per-doc
partitions bound every sort (no global ordering), so the operator
scales with document count, not corpus size.  Deterministic
tie-breaks everywhere — (gap desc, mid desc) for the split, (y, x)
within a column — so the result is a pure function of the geometry
and both engines replay it identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def reading_order(
    words: DataFrame,
    id_col: str = "doc_id",
    min_gap: float = 300.0,
) -> DataFrame:
    """Order word boxes (doc_id, word, x0, y0, x1, y1) into reading
    sequence.  Adds `col` (0/1) and dense `seq` per document."""
    centered = words.withColumn(
        "_cx", (F.col("x0") + F.col("x1")) / 2.0
    )

    wc = Window.partitionBy(id_col).orderBy("_cx")
    gaps = (
        centered.select(id_col, "_cx")
        .distinct()
        .withColumn("_prev", F.lag("_cx").over(wc))
        .filter(F.col("_prev").isNotNull())
        .withColumn("_gap", F.col("_cx") - F.col("_prev"))
        .withColumn("_mid", (F.col("_cx") + F.col("_prev")) / 2.0)
    )
    wbest = Window.partitionBy(id_col).orderBy(
        F.col("_gap").desc(), F.col("_mid").desc()
    )
    boundaries = (
        gaps.withColumn("_rn", F.row_number().over(wbest))
        .filter((F.col("_rn") == 1) & (F.col("_gap") >= min_gap))
        .select(id_col, F.col("_mid").alias("_boundary"))
    )

    placed = centered.join(boundaries, id_col, "left").withColumn(
        "col",
        F.when(
            F.col("_boundary").isNotNull()
            & (F.col("_cx") > F.col("_boundary")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    worder = Window.partitionBy(id_col).orderBy(
        "col", F.col("y0").asc(), F.col("x0").asc()
    )
    return (
        placed.withColumn("seq", (F.row_number().over(worder) - 1).cast("long"))
        .drop("_cx", "_boundary")
    )


def synth_word_boxes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 3,
    col_offset: float = 800.0,
) -> DataFrame:
    """Deterministic word-box fixture: lay each document's tokens on
    a page — even doc_ids two-column (first half of the lines on the
    left, second half on the right at `col_offset`), odd doc_ids
    single-column — closed-form over the token index so the DuckDB
    oracle rebuilds the identical geometry.  Reconstructing reading
    order from these boxes must return exactly the original token
    sequence (pinned by test and by the oracle replaying both
    sides)."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).alias("_i", "word"),
    )
    n_lines = F.ceil(
        F.count(F.lit(1)).over(Window.partitionBy(id_col))
        / F.lit(words_per_line)
    )
    line = (F.col("_i") / words_per_line).cast("long")
    pos = F.col("_i") % words_per_line
    staged = toks.withColumn("_nl", n_lines).select(
        id_col,
        "word",
        "_i",
        line.alias("_line"),
        pos.alias("_pos"),
        F.ceil(F.col("_nl") / 2).alias("_half"),
    )
    two_col = (F.col(id_col) % 2 == 0) & (F.col("_line") >= F.col("_half"))
    col = F.when(two_col, F.lit(1)).otherwise(F.lit(0))
    row = F.when(two_col, F.col("_line") - F.col("_half")).otherwise(
        F.col("_line")
    )
    x0 = col * F.lit(col_offset) + F.col("_pos") * F.lit(120.0)
    y0 = row * F.lit(20.0)
    return staged.select(
        id_col,
        "word",
        F.col("_i").alias("token_idx"),
        x0.alias("x0"),
        y0.alias("y0"),
        (x0 + 100.0).alias("x1"),
        (y0 + 15.0).alias("y1"),
    )
