"""Unit tests for the deterministic hOCR synth/parse core."""

import hashlib

import pytest

from mimeograph_spark.operators.hocr import (
    HocrError,
    ocr_page,
    ocr_text_closed_form,
    parse_hocr,
    synth_hocr,
)


def test_roundtrip_matches_closed_form():
    for ref in [f"pg:{d}:{i}" for d in range(20) for i in range(6)]:
        assert ocr_page(ref) == ocr_text_closed_form(ref)


def test_bad_ref_is_page_error():
    assert ocr_page("pg:1:1#bad") is None
    with pytest.raises(HocrError):
        parse_hocr(synth_hocr("pg:1:1#bad"))


def test_empty_word_drop():
    # Find a ref whose digest has a word starting with '0'/'1'/'2' and
    # check that word is absent from the parsed output.
    for i in range(500):
        ref = f"probe:{i}"
        h = hashlib.md5(ref.encode()).hexdigest()
        words = [h[s : s + 4] for s in (0, 8, 16, 24)]
        dropped = [w for w in words if w[0] in "012"]
        if dropped:
            out = ocr_page(ref)
            for w in dropped:
                assert w not in out.split(" ")
            return
    pytest.fail("no probe ref exercised the empty-word drop")


def test_invalid_root_class_rejected():
    with pytest.raises(HocrError):
        parse_hocr("<div class='ocr_pagex' title='bbox 0 0 5 5'>x</div>")


def test_missing_bbox_rejected():
    with pytest.raises(HocrError):
        parse_hocr("<div class='ocr_page' title='image only'>x</div>")
