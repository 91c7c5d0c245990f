"""Unicode text normalization — the canonical first stage of every
text-curation pipeline (mixed crawls carry decomposed accents,
control bytes, and whitespace junk that break tokenizer and dedup
equality: 'café' NFD != 'café' NFC as bytes).

Pipeline (order is part of the contract and mirrored in the oracle):

1. NFC unicode normalization — the ONE Python step: Spark has no
   normalization builtin, so it runs as an Arrow-batched pandas UDF
   (unicodedata); DuckDB's utf8proc `nfc_normalize` provides a true
   independent oracle for it.
2. control-char strip (C0 minus tab/newline/formfeed/CR, plus DEL) —
   JVM regexp_replace, codegen.
3. whitespace-run collapse to a single space — the class is written
   explicitly as [ \\t\\n\\r\\f] because Java's \\s includes \\x0B
   and RE2's does not.
4. trim.

Everything after the UDF stays whole-stage codegen; the UDF is one
Arrow batch pass over the text column only.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_CTRL = r"[\x00-\x08\x0B\x0E-\x1F\x7F]"
_WS = r"[ \t\n\r\f]+"


@pandas_udf("string")
def _nfc(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: unicodedata.normalize("NFC", x)
        if x is not None
        else None
    )


def normalize_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per doc: the normalized text, whether anything changed, and the
    code-point delta.  Output: (doc_id, norm_text, changed,
    delta_chars)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(_nfc(F.col(text_col)), _CTRL, ""),
            _WS,
            " ",
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_orig"),
        norm.alias("norm_text"),
    ).select(
        "doc_id",
        "norm_text",
        (F.col("norm_text") != F.col("_orig")).alias("changed"),
        (F.length("_orig") - F.length("norm_text"))
        .cast("long")
        .alias("delta_chars"),
    )
