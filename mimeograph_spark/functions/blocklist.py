"""Phrase-blocklist filtering — the policy/safety scrub stage every
production training-data pipeline runs before packing (bad-word lists,
site boilerplate phrases, license markers).

A phrase matches when it appears as a token-boundary-delimited
sequence of the whitespace-tokenized lowercased text (never a bare
substring — "ass" must not match "class").

Two physical strategies, equal semantics (pinned by a test):

- ``mode="scan"`` (default, bounded blocklists): the phrase list is
  embedded as an array literal and each doc evaluates a codegen
  ``contains`` per phrase over its single-space-normalized text.  One
  narrow scan, ZERO shuffles — for the typical 10^2..10^4-phrase
  policy list this is the plan you want at 100 TB.
- ``mode="join"`` (huge blocklists): docs explode to (doc_id, pos,
  token), broadcast-join against each phrase's FIRST token (the
  anchor), and candidates verify the full phrase with an index-order
  ``slice == phrase_tokens`` compare.  Work is proportional to anchor
  hits, not |docs| x |phrases|, so a million-phrase list costs one
  broadcast hash join instead of a million contains calls per doc.

Cited reference behavior: the reference has no corpus-policy stage
(mimeograph.coffee is a per-document extraction chain); this is part
of the training-data generalization layer, like `functions/pii.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cacheutil import register_persisted


def _norm(text_col):
    """Lowercased, single-space-separated, space-padded form: phrase
    containment with space padding == token-sequence match."""
    return F.concat(
        F.lit(" "),
        F.regexp_replace(F.trim(F.lower(text_col)), r"\s+", " "),
        F.lit(" "),
    )


def blocklist_filter(
    docs: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "scan",
) -> DataFrame:
    """Per doc: the sorted list of blocklist phrases it contains,
    their count, and ``keep = (no phrase matched)``."""
    if not phrases:
        raise ValueError("empty blocklist")
    norm = [" ".join(p.lower().split()) for p in phrases]
    if mode == "scan":
        arr = F.array(*[F.lit(p) for p in sorted(set(norm))])
        matched = F.array_sort(
            F.filter(
                arr,
                lambda ph: F.contains(
                    F.col("_norm"), F.concat(F.lit(" "), ph, F.lit(" "))
                ),
            )
        )
        return (
            docs.select(
                F.col(id_col).alias("doc_id"),
                _norm(F.col(text_col)).alias("_norm"),
            )
            .select(
                "doc_id",
                matched.alias("matched"),
            )
            .select(
                "doc_id",
                "matched",
                F.size("matched").cast("long").alias("n_matches"),
                (F.size("matched") == 0).alias("keep"),
            )
        )
    if mode != "join":
        raise ValueError(f"unknown mode {mode!r}")

    from pyspark.storagelevel import StorageLevel

    spark = docs.sparkSession
    pdf = spark.createDataFrame(
        [(p, p.split(" ")) for p in sorted(set(norm))],
        "phrase string, ptoks array<string>",
    ).select(
        "phrase",
        "ptoks",
        F.element_at("ptoks", 1).alias("tok"),
        F.size("ptoks").alias("plen"),
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(
            F.trim(F.lower(F.col(text_col))), r"\s+"
        ).alias("toks"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    hits = (
        toks.select(
            "doc_id", "toks", F.posexplode("toks").alias("pos", "tok")
        )
        .join(F.broadcast(pdf), "tok")
        # verify the full phrase at the anchor position, index order
        .filter(
            F.slice(F.col("toks"), F.col("pos") + 1, F.col("plen"))
            == F.col("ptoks")
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("phrase")).alias("matched"))
    )
    out = (
        toks.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("matched"), F.array().cast("array<string>")
            ).alias("matched"),
        )
        .select(
            "doc_id",
            "matched",
            F.size("matched").cast("long").alias("n_matches"),
            (F.size("matched") == 0).alias("keep"),
        )
    )
    return register_persisted(out, toks)
