"""End-to-end extraction pipeline: the reference's eight-job chain
(extract -> split -> convert -> hocr -> pdf -> layer -> stitch ->
lastextract, src/mimeograph.coffee:436-444) as one declarative Spark
plan.

Plan shape (only ONE shuffle, and only for mega-page docs):

    read documents
      |-- main branch (narrow, SINGLE PASS over the input):
      |     classify + native projection + small-doc OCR fused into one
      |     projection — the OCR UDF receives an EMPTY ref array for
      |     native docs, so the doc-level short-circuit
      |     (src/mimeograph.coffee:542-547) costs nothing in Python
      |-- OCR page branch    (1 shuffle) mega docs: explode -> repartition
      |                                  -> page UDF -> salted stitch
      '-- unionByName

Fusing native + small-OCR into one projection matters at scale: a
branch-per-case plan re-scans (or re-derives) the input once per
branch; the fused plan reads it once.  The size-based routing keeps
the common case shuffle-free while giving mega-page documents
(FIXTURES.md `megapage`) page-level parallelism — the reference's
worker-queue fan-out (:562-566) — plus salting so no single reducer
owns a 50k-page stitch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cacheutil import register_persisted
from ..operators.classify import (
    HAS_NATIVE,
    N_MEDIA,
    sort_spans_by_offset,
    with_doc_class,
)
from ..operators.ocr import ocr_page_udf, ocr_refs_udf
from ..operators.stitch import stitch_pages
from ..schema import KIND_MEDIA, KIND_TEXT, STATUS_COMPLETE, STATUS_FAILED

# Docs with more media pages than this go through the exploded
# page-parallel path; tune so an Arrow batch of `threshold`-page docs
# stays comfortably in Python-worker memory.
DEFAULT_PAGE_THRESHOLD = 512

_EMPTY_SPANS = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def extract(
    documents: DataFrame,
    page_threshold: int = DEFAULT_PAGE_THRESHOLD,
    salted_stitch: bool = True,
    num_salts: int = 16,
    page_partitions: int | None = None,
    single_scan: bool = False,
) -> DataFrame:
    """documents (DOCUMENTS_SCHEMA) -> results (RESULT_SCHEMA).

    `single_scan` persists the classified frame (MEMORY_AND_DISK) so
    the mega-doc branch reads the cache instead of re-scanning and
    re-classifying the full input for a ~0%-selectivity filter (the
    `n_media > page_threshold` predicate can't push into parquet
    because spans is a computed nested column).

    Measured trade-off (sf0.1): for parquet-scan inputs the cache wins
    2-4x on repeated/branched consumption (0.8s vs 5.9s in the query
    bench), so the driver queries enable it; for the 10M-doc GENERATED
    bench corpus (broadcast crossJoin, cheap to recompute) the cache
    write costs ~50% throughput, so it stays opt-in rather than
    default.  Turn it on when the input is an expensive scan and the
    increment is bounded (the resumable runner's micro-batches); a
    corpus written through `corpus.write_routed_corpus` carries the
    routing columns IN STORAGE (has_native partitions the files,
    n_media has sorted row-group stats) and prunes at plan time,
    making both modes moot — with_doc_class is idempotent, so stored
    routing columns flow through untouched (plan-tested)."""
    classified = with_doc_class(documents)
    if single_scan:
        from pyspark.storagelevel import StorageLevel

        classified = classified.persist(StorageLevel.MEMORY_AND_DISK)

    # -- main branch: native + bounded-OCR docs, one narrow pass -------
    main = classified.filter(
        F.col(HAS_NATIVE) | (F.col(N_MEDIA) <= page_threshold)
    )
    native_sorted = sort_spans_by_offset(
        F.filter("spans", lambda s: s["kind"] == KIND_TEXT)
    )
    native_out = F.transform(
        native_sorted,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    media_sorted = F.when(
        F.col(HAS_NATIVE), F.lit([]).cast(_EMPTY_SPANS)
    ).otherwise(
        sort_spans_by_offset(
            F.filter("spans", lambda s: s["kind"] == KIND_MEDIA)
        )
    )
    # Only an array<string> of refs crosses the Arrow boundary; span
    # structs are rebuilt in whole-stage codegen via zip_with.  Native
    # docs contribute an empty array -> near-zero Python cost.
    staged = main.select(
        "doc_id",
        F.col(HAS_NATIVE).alias(HAS_NATIVE),
        native_out.alias("_native"),
        media_sorted.alias("_media"),
    ).withColumn(
        "_texts",
        ocr_refs_udf(F.transform("_media", lambda s: s["media_ref"])),
    )
    zipped = F.zip_with(
        F.col("_media"),
        F.col("_texts"),
        lambda m, t: F.struct(
            F.lit("ocr").alias("kind"),
            t.alias("text"),
            m["media_ref"].alias("media_ref"),
            m["offset"].alias("offset"),
        ),
    )
    # zipped is consumed by BOTH output branches (kept spans and
    # error offsets); staged as a real column it is built once per
    # row — inline, the zip_with struct rebuild runs twice
    main_out = staged.select(
        "doc_id",
        F.col(HAS_NATIVE).alias(HAS_NATIVE),
        F.col("_native"),
        zipped.alias("_zip"),
    ).select(
        "doc_id",
        F.col(HAS_NATIVE).alias(HAS_NATIVE),
        F.when(F.col(HAS_NATIVE), F.col("_native"))
        .otherwise(
            F.filter(F.col("_zip"), lambda z: z["text"].isNotNull())
        )
        .alias("spans_out"),
        F.when(F.col(HAS_NATIVE), F.lit([]).cast("array<int>"))
        .otherwise(
            F.transform(
                F.filter(F.col("_zip"), lambda z: z["text"].isNull()),
                lambda z: z["offset"],
            )
        )
        .alias("error_pages"),
    ).select(
        "doc_id",
        "spans_out",
        F.when(
            ~F.col(HAS_NATIVE)
            & (F.size("error_pages") > 0)
            & (F.size("spans_out") == 0),
            F.lit(STATUS_FAILED),
        )
        .otherwise(F.lit(STATUS_COMPLETE))
        .alias("status"),
        "error_pages",
    )

    # -- page-parallel path: mega docs ---------------------------------
    big = classified.filter(
        ~F.col(HAS_NATIVE) & (F.col(N_MEDIA) > page_threshold)
    )
    pages = big.select(
        "doc_id",
        F.explode(
            F.filter("spans", lambda s: s["kind"] == KIND_MEDIA)
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.media_ref").alias("media_ref"),
    )
    if page_partitions:
        # Spread one mega-doc's pages across tasks (round-robin beats
        # hash-by-doc here: the whole point is splitting a single key).
        pages = pages.repartition(page_partitions)
    ocr_pages = pages.select(
        "doc_id",
        "offset",
        "media_ref",
        F.lit("ocr").alias("kind"),
        ocr_page_udf("media_ref").alias("text"),
    )
    big_out = stitch_pages(ocr_pages, salted=salted_stitch, num_salts=num_salts)

    out = main_out.unionByName(big_out)
    if single_scan:
        out = register_persisted(out, classified)
    return out


def extract_flat(documents: DataFrame, **kwargs) -> DataFrame:
    """Pipeline result flattened to scalar columns (for SQL-oracle
    comparison and sinks that don't want nested arrays)."""
    res = extract(documents, **kwargs)
    from ..cacheutil import persisted_deps

    out = res.select(
        "doc_id",
        "status",
        F.size("spans_out").cast("long").alias("n_spans_out"),
        F.size("error_pages").cast("long").alias("n_errors"),
        F.array_join(
            F.transform("error_pages", lambda o: o.cast("string")), ","
        ).alias("error_pages_csv"),
        F.when(
            F.size("spans_out") > 0,
            F.array_join(F.transform("spans_out", lambda s: s["text"]), " "),
        ).alias("final_text"),
    )
    return register_persisted(out, *persisted_deps(res))


def assemble_interleaved(docs: DataFrame) -> DataFrame:
    """Model-ready interleaved example assembly: spans in offset order
    become one training string where each media span is an indexed
    placeholder token (`<|media_k|>`), with the refs aggregated in
    the same order for the loader to resolve.  Pure array expressions
    per row — zero shuffle, zero Python; the slice-filter media
    ordinal is O(spans^2) per doc, bounded by the span cap."""
    sp = F.array_sort(
        F.transform(
            "spans",
            lambda s: F.struct(
                s["offset"].alias("o"),
                s["kind"].alias("k"),
                s["text"].alias("t"),
                s["media_ref"].alias("m"),
            ),
        )
    )
    staged = docs.select("doc_id", sp.alias("_sp"))
    pieces = F.transform(
        "_sp",
        lambda s, i: F.when(
            s["k"] == "text", F.coalesce(s["t"], F.lit(""))
        ).otherwise(
            F.concat(
                F.lit("<|media_"),
                F.size(
                    F.filter(
                        F.slice("_sp", 1, i), lambda x: x["k"] == "media"
                    )
                ).cast("string"),
                F.lit("|>"),
            )
        ),
    )
    media = F.filter("_sp", lambda s: s["k"] == "media")
    return staged.select(
        "doc_id",
        F.array_join(pieces, " ").alias("example_text"),
        F.array_join(F.transform(media, lambda s: s["m"]), ",").alias(
            "media_refs_csv"
        ),
        F.size(media).cast("long").alias("n_media"),
        F.size(F.filter("_sp", lambda s: s["k"] == "text"))
        .cast("long")
        .alias("n_text"),
    )
