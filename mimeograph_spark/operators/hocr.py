"""Deterministic OCR simulation: hOCR synthesis + hOCR parse.

The reference runs `tesseract` to produce hOCR HTML per raster page
(Recognizer, /root/reference/src/mimeograph.coffee:226-261 with
`tessedit_create_hocr 1`, tesseract_hocr_config.txt:1), then parses it
with xml2js — validating that the root div carries class `ocr_page`
(src/mimeograph.coffee:302) and extracting the page bbox with the regex
/bbox((\\s+\\d+){4})/ (src/mimeograph.coffee:303-305).  The vendored
patched pdfbeads additionally drops zero-length `ocrx_word` units
(src/patched_pdfbeads.rb:10-14,29-33) — that drop affects the text
output and is replicated here.

No image libraries exist in this environment, so the raster→hOCR step
is simulated deterministically: the hOCR content is a pure function of
`media_ref` (FIXTURES.md §1).  The simulation is still a genuine
batched byte-stream compute — full hOCR markup is synthesized and then
actually parsed (class validation, bbox regex, word extraction,
empty-word drop) inside Arrow-batched pandas UDFs, so benchmark
numbers measure real string-processing work, not a lookup.

Closed form of the final text (what the DuckDB oracle computes):

    h = md5(media_ref)  # 32 hex chars
    words = [h[0:4], h[8:12], h[16:20], h[24:28]]
    kept  = [w for w in words if w[0] not in '012']
    text  = ' '.join(kept)

A `media_ref` ending in '#bad' synthesizes invalid hOCR (root class is
not `ocr_page`), which the parser rejects — exercising the reference's
page-error path (src/mimeograph.coffee:729-759): the page lands in
`error_pages`, the document continues.
"""

from __future__ import annotations

import hashlib
import re

# Word positions in the md5 hex digest (0-based start, length 4).
_WORD_STARTS = (0, 8, 16, 24)
# A word whose first hex char is in this set is emitted as an empty
# ocrx_word (simulating tesseract noise); the parser drops it, per the
# patched-pdfbeads empty-word drop.
_EMPTY_MARKERS = frozenset("012")

BAD_SUFFIX = "#bad"

_PAGE_RE = re.compile(
    r"<div[^>]*class='([^']*)'[^>]*title='([^']*)'", re.DOTALL
)
# The reference's own bbox regex, src/mimeograph.coffee:303.
_BBOX_RE = re.compile(r"bbox((\s+\d+){4})")
_WORD_RE = re.compile(r"<span class='ocrx_word'[^>]*>([^<]*)</span>")


class HocrError(ValueError):
    """Raised when hOCR markup fails validation (invalid root class or
    missing/odd bbox) — maps to a page error, not a job failure."""


# The per-word x origins are invariants of the geometry: x0 =
# (k * 113) % max(width, 1) with k <= 3 and width >= 500, so the
# modulo never wraps and x0 is the constant k * 113.  Hoisting the
# whole page skeleton into one module-level template turns synthesis
# into a single %-format — byte-identical markup, ~2.5x less Python
# per page in the extract hot loop.
_PAGE_TEMPLATE = (
    "<div class='ocr_page' id='page_1' "
    "title='image \"%s\"; bbox 0 0 %d %d'>"
    "<span class='ocr_line' title='bbox 0 40 %d 70'>"
    + " ".join(
        f"<span class='ocrx_word' title='bbox {k * 113} 40 "
        f"{k * 113 + 90} 70'>%s</span>"
        for k in range(len(_WORD_STARTS))
    )
    + "</span></div>"
)


def synth_hocr(media_ref: str) -> str:
    """Synthesize tesseract-style hOCR for a raster page reference.

    Deterministic: content is a pure function of `media_ref`.  Refs
    ending in '#bad' produce markup whose root div class is not
    `ocr_page`, which `parse_hocr` rejects (page error).
    """
    h = hashlib.md5(media_ref.encode("utf-8")).hexdigest()
    if media_ref.endswith(BAD_SUFFIX):
        # Invalid page: wrong root class, as if tesseract emitted junk.
        return f"<div class='ocr_noise' title='bbox 0 0 0 0'>{h}</div>"
    width = 500 + int(h[0:4], 16) % 2000
    height = 500 + int(h[4:8], 16) % 2000
    empty = _EMPTY_MARKERS
    return _PAGE_TEMPLATE % (
        media_ref,
        width,
        height,
        width,
        "" if h[0] in empty else h[0:4],
        "" if h[8] in empty else h[8:12],
        "" if h[16] in empty else h[16:20],
        "" if h[24] in empty else h[24:28],
    )


def parse_hocr(hocr: str) -> str:
    """Parse hOCR markup to the page's text.

    Validates the root class is `ocr_page` (src/mimeograph.coffee:302)
    and that the title carries a 4-int bbox (:303-305); extracts
    `ocrx_word` contents, dropping zero-length words
    (src/patched_pdfbeads.rb:29-33); joins with single spaces.
    """
    m = _PAGE_RE.search(hocr)
    if m is None or m.group(1) != "ocr_page":
        raise HocrError("root element is not an ocr_page div")
    if _BBOX_RE.search(m.group(2)) is None:
        raise HocrError("ocr_page title has no bbox")
    words = [w for w in _WORD_RE.findall(hocr) if w]
    return " ".join(words)


def ocr_page(media_ref: str) -> str | None:
    """Full per-page OCR: synthesize hOCR, parse it back to text.

    Returns the page text, or None if the page failed (invalid hOCR).
    """
    try:
        return parse_hocr(synth_hocr(media_ref))
    except HocrError:
        return None


def ocr_text_closed_form(media_ref: str) -> str | None:
    """Reference oracle for `ocr_page` — the closed form, bypassing the
    markup round-trip.  Used by tests and the pure-Python oracle; the
    DuckDB oracle SQL expresses the same formula with md5/substr."""
    if media_ref.endswith(BAD_SUFFIX):
        return None
    h = hashlib.md5(media_ref.encode("utf-8")).hexdigest()
    kept = [
        h[s : s + 4] for s in _WORD_STARTS if h[s] not in _EMPTY_MARKERS
    ]
    return " ".join(kept)


def ocr_text_sql(ref_expr: str) -> str:
    """ANSI-SQL (Spark + DuckDB compatible) closed form of the OCR text
    for a media_ref expression.  NULL-safe: bad refs are expected to be
    filtered out by the caller."""
    cases = []
    for s in _WORD_STARTS:
        pos = s + 1  # SQL substr is 1-based
        markers = ", ".join(f"'{c}'" for c in sorted(_EMPTY_MARKERS))
        cases.append(
            f"CASE WHEN substr(md5({ref_expr}), {pos}, 1) IN ({markers}) "
            f"THEN NULL ELSE substr(md5({ref_expr}), {pos}, 4) END"
        )
    return "concat_ws(' ', " + ", ".join(cases) + ")"
