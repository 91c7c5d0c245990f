"""OCR stage: Arrow-batched pandas UDFs over media spans.

Replaces the reference's per-page `convert` (ImageMagick rasterize,
src/mimeograph.coffee:175-215) + `hocr` (tesseract, :226-261) + hOCR
parse (:297-305) chain — which costs >=5 process spawns and >=6 Redis
blob round-trips PER PAGE — with vectorized in-process compute: one
Arrow batch transfer amortizes the Python boundary over thousands of
pages.

Two physical paths, same semantics (pipeline.py routes between them):

- `ocr_document_udf` (narrow): one call per document, operating on the
  whole span array in place.  Zero shuffle: for the common case (docs
  with a bounded page count) the entire OCR branch is a single narrow
  stage.
- `ocr_page_udf` (page-parallel): one call per exploded page, used for
  mega-page documents whose pages must spread across many tasks (the
  reference's page-level fan-out, src/mimeograph.coffee:562-566).

Page errors never raise: a failed page yields NULL text and is
accounted in `error_pages` downstream (src/mimeograph.coffee:729-759
semantics — page errors don't kill the document).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..schema import DOC_OCR_RESULT_TYPE, KIND_MEDIA, KIND_OCR
from .hocr import ocr_page


def _ocr_batch(refs: Iterable[str]) -> list[str | None]:
    """Synthesize + parse hOCR for a batch of page refs (None on page
    error).  The hot loop is pure string compute over one Arrow batch."""
    return [ocr_page(r) if r is not None else None for r in refs]


@F.pandas_udf(StringType())
def ocr_page_udf(refs: pd.Series) -> pd.Series:
    """Page-parallel path: media_ref -> page text (NULL = page error)."""
    return pd.Series(_ocr_batch(refs), index=refs.index, dtype=object)


@F.pandas_udf(DOC_OCR_RESULT_TYPE)
def ocr_document_udf(spans: pd.Series) -> pd.DataFrame:
    """Narrow path: whole span array in -> (spans_out, error_pages) out.

    Media spans are OCR'd; text spans are dropped (the document reached
    this stage only because it has no usable native text, so its text
    spans are whitespace-only — they do not contribute to output, cf.
    the whitespace_native scenario in FIXTURES.md §1).
    """
    spans_out: list[list[dict]] = []
    error_pages: list[list[int]] = []
    # Flatten all media refs in the batch into one OCR pass, then
    # regroup — keeps the per-document Python overhead minimal.
    flat_refs: list[str] = []
    doc_media: list[list[dict]] = []
    for doc_spans in spans:
        media = [
            s for s in (doc_spans if doc_spans is not None else [])
            if s["kind"] == KIND_MEDIA
        ]
        media.sort(key=lambda s: s["offset"])
        doc_media.append(media)
        flat_refs.extend(s["media_ref"] for s in media)
    flat_texts = _ocr_batch(flat_refs)
    pos = 0
    for media in doc_media:
        out: list[dict] = []
        errs: list[int] = []
        for s in media:
            text = flat_texts[pos]
            pos += 1
            if text is None:
                errs.append(s["offset"])
            else:
                out.append(
                    {
                        "kind": KIND_OCR,
                        "text": text,
                        "media_ref": s["media_ref"],
                        "offset": s["offset"],
                    }
                )
        spans_out.append(out)
        error_pages.append(errs)
    return pd.DataFrame({"spans_out": spans_out, "error_pages": error_pages})
