"""End-to-end extraction pipeline: the reference's eight-job chain
(extract -> split -> convert -> hocr -> pdf -> layer -> stitch ->
lastextract, src/mimeograph.coffee:436-444) as one declarative Spark
plan.

Plan shape (only ONE shuffle, and only for mega-page docs):

    read documents
      |-- classify (narrow: exists/filter over span arrays)
      |-- native branch        (narrow)  docs with usable text layer
      |-- OCR narrow branch    (narrow)  small docs: whole-doc pandas UDF
      |-- OCR page branch    (1 shuffle) mega docs: explode -> repartition
      |                                  -> page UDF -> salted stitch
      '-- unionByName

The doc-level OCR short-circuit (src/mimeograph.coffee:542-547) means
the expensive UDF only ever sees the no-native-text documents.  The
size-based routing keeps the common case shuffle-free while giving
mega-page documents (FIXTURES.md `megapage`) page-level parallelism —
the reference's worker-queue fan-out (:562-566) — plus salting so no
single reducer owns a 50k-page stitch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.classify import (
    HAS_NATIVE,
    N_MEDIA,
    native_branch,
    with_doc_class,
)
from ..operators.ocr import ocr_document_udf, ocr_page_udf
from ..operators.stitch import stitch_pages
from ..schema import KIND_MEDIA, STATUS_COMPLETE, STATUS_FAILED

# Docs with more media pages than this go through the exploded
# page-parallel path; tune so an Arrow batch of `threshold`-page docs
# stays comfortably in Python-worker memory.
DEFAULT_PAGE_THRESHOLD = 512


def extract(
    documents: DataFrame,
    page_threshold: int = DEFAULT_PAGE_THRESHOLD,
    salted_stitch: bool = True,
    num_salts: int = 16,
    page_partitions: int | None = None,
) -> DataFrame:
    """documents (DOCUMENTS_SCHEMA) -> results (RESULT_SCHEMA)."""
    classified = with_doc_class(documents)

    native = native_branch(classified)

    ocr_docs = classified.filter(~F.col(HAS_NATIVE))

    # -- narrow path: bounded-size docs, zero shuffle ------------------
    small = ocr_docs.filter(F.col(N_MEDIA) <= page_threshold)
    small_res = small.withColumn("_ocr", ocr_document_udf("spans"))
    small_out = small_res.select(
        "doc_id",
        F.col("_ocr.spans_out").alias("spans_out"),
        F.when(
            (F.col(N_MEDIA) > 0) & (F.size("_ocr.spans_out") == 0),
            F.lit(STATUS_FAILED),
        )
        .otherwise(F.lit(STATUS_COMPLETE))
        .alias("status"),
        F.array_sort(F.col("_ocr.error_pages")).alias("error_pages"),
    )

    # -- page-parallel path: mega docs ---------------------------------
    big = ocr_docs.filter(F.col(N_MEDIA) > page_threshold)
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

    return native.unionByName(small_out).unionByName(big_out)


def extract_flat(documents: DataFrame, **kwargs) -> DataFrame:
    """Pipeline result flattened to scalar columns (for SQL-oracle
    comparison and sinks that don't want nested arrays)."""
    res = extract(documents, **kwargs)
    return res.select(
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
