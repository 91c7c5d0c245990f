"""Sequence packing — lay documents out into fixed token-budget
training sequences.

LLM pretraining consumes documents as a token stream: docs are
concatenated (with a separator token) and chopped into context-length
sequences; a document may span a sequence boundary.  The planner's
job is the LAYOUT — for every document, which sequence it starts in
and at which offset — computed distributively and deterministically.

Scale design (the part a naive global window gets wrong):

- A single global ``Window.orderBy`` collapses the whole corpus into
  ONE task — the classic 100 TB killer.  Instead the corpus is hashed
  into ``n_shards`` independent token streams (the same md5-bucket
  primitive the sampling/dedup stages use), each packed by its own
  window.  Sequences are identified by ``(shard, seq_id)``; training
  shards are exactly what a multi-host data loader wants anyway.
- ``n_shards`` scales with the corpus (tokens_per_shard =
  corpus_tokens / n_shards), so per-task state stays bounded at any
  scale; the only shuffle is the one hash partition + in-partition
  sort that the window needs.
- Layout is a pure function of (doc ids, token counts): hash
  sharding + doc_id ordering, no RNG, no partition-count dependence —
  rerunning on any cluster size yields byte-identical packing (the
  DuckDB oracle replays it exactly).

Reference behavior being generalized: the stitch stage's
ordered-reassembly contract (offset-ordered spans -> one stream,
mimeograph.coffee:406-431); here the stream is additionally chopped
into budget-sized sequences, which the reference never needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mimeograph_spark.functions.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_shards: int = 16,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    sep_tokens: int = 1,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Within each shard, documents are concatenated in ``id_col`` order,
    every document followed by ``sep_tokens`` separator token(s); the
    stream is chopped every ``budget`` tokens.  Output adds:

    - ``shard``        — which independent token stream
    - ``seq_id``       — sequence (0-based within shard) the doc starts in
    - ``begin_offset`` — token offset of the doc within that sequence
    - ``n_seqs``       — how many sequences the doc spans (>=1)

    One hash shuffle + one in-partition sort; everything else is
    codegen arithmetic on a running sum.
    """
    toks = (F.col(tokens_col) + F.lit(sep_tokens)).cast("long")
    shard = hash_bucket(F.col(id_col), salt="pack", n_buckets=n_shards)
    staged = df.withColumn("shard", shard).withColumn("_t", toks)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("_t").over(w), F.lit(0)).cast("long")
    staged = staged.withColumn("_cb", cum_before)
    end_tok = F.col("_cb") + F.col("_t") - F.lit(1)
    return staged.select(
        *df.columns,
        F.col("shard"),
        (F.col("_cb") / budget).cast("long").alias("seq_id"),
        (F.col("_cb") % budget).cast("long").alias("begin_offset"),
        (
            (end_tok / budget).cast("long")
            - (F.col("_cb") / budget).cast("long")
            + F.lit(1)
        ).alias("n_seqs"),
    )


def sequence_manifest(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Per-(shard, seq_id) manifest: how many documents START in each
    sequence and how many tokens of it they begin to fill — the
    loader-facing index of the packed layout.  (Docs spilling in from
    the previous sequence are accounted there; the stream is dense by
    construction, so fill only falls short on each shard's final
    sequence.)"""
    return (
        packed.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs_started"),
            F.min("begin_offset").alias("first_offset"),
        )
        .withColumn("budget", F.lit(budget).cast("long"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Stride-windowed document chunking — the long-context prep
    step: a document longer than the model's window is cut into
    overlapping token chunks (window W, stride S < W gives W-S tokens
    of overlap) so no span is ever seen only at a truncation
    boundary.  Chunk k covers 1-based token positions
    [1 + k*S, 1 + k*S + W); the start sequence runs while
    start <= max(n - W, 0) + 1, so the final chunk always reaches the
    last token and a doc with n <= W yields exactly one chunk.
    The last start is 1 + ceil(max(n-W,0)/S)*S's predecessor on the
    stride grid — i.e. strides continue until the tail is covered,
    and the final chunk may be shorter than W (slice truncates at the
    last token).  Empty/whitespace docs yield none.  Output, one row
    per chunk: (doc_id, chunk_id, start_tok, n_tok, chunk_text).

    Scale shape: pure narrow codegen — split, sequence/transform/
    posexplode, slice — zero shuffle, zero Python, one scan; the
    token array is staged once per doc so CollapseProject cannot
    re-split per chunk."""
    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    # NULL text must behave like empty: without the coalesce a NULL
    # dodges the length==0 guard (NULL comparison) and emits a ghost
    # chunk with a NULL token array
    t = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    base = df.select(
        F.col(id_col),
        F.when(F.length(t) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(t, r"\s+"))
        .alias("_tk"),
    )
    n = F.size(F.col("_tk"))
    # last start = 1 + ceil(max(n-W,0)/S)*S, so strides continue
    # until the final chunk reaches the last token
    n_extra = F.greatest(n - window, F.lit(0))
    stop = (
        F.lit(1)
        + F.floor((n_extra + F.lit(stride - 1)) / stride).cast("int")
        * stride
    )
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), stop, F.lit(stride)).cast("array<int>")
    )
    chunks = base.select(
        id_col, "_tk", F.posexplode(starts).alias("chunk_id", "start_tok")
    )
    piece = F.slice(F.col("_tk"), F.col("start_tok"), window)
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.size(piece).cast("int").alias("n_tok"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
