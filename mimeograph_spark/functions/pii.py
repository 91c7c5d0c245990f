"""PII detection and redaction over a text column.

Every production training-data pipeline scrubs obvious PII (emails,
phone numbers, IP addresses, ID-shaped tokens) before packing; the
reference has no counterpart (it never sees content semantics), so
this follows the standard scrub-stage recipe: a fixed, ordered list of
regex classes, each replaced by a typed placeholder token, with
per-class match counts as the audit side channel (the same "no silent
caps" discipline as the dedup drop-stats).

Cross-engine contract (the whole operator is DuckDB-oracle-checkable):

- Patterns are RE2-safe AND Java-regex-identical: no lookarounds, no
  backrefs, no alternations whose ORDER could matter (RE2 and Java
  both use leftmost-first greedy matching for these constructs, but
  ordered alternations are where engines historically diverge, so the
  IPv4 pattern deliberately does not validate octet ranges).
- Redaction is SEQUENTIAL in class order; placeholder tokens contain
  no characters any later pattern can match, so the composition is
  order-stable.
- Counts are derived from the REDACTED text (occurrences of each
  placeholder token) rather than re-matching the original — this is
  both cheaper (plain string ops on one staged column, no duplicated
  regex trees — the Catalyst duplicated-expression disease) and more
  honest: a digit run inside an email is counted as the email that
  was actually redacted, never double-counted as an ID.

Scale shape: pure whole-stage-codegen string expressions, zero
shuffle, one pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (class, pattern, token) in REDACTION ORDER — most specific first so
# a broader later class can't eat a narrower earlier one (an email's
# digit run must become <EMAIL>, not <NUM>).
PII_CLASSES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # no octet-range validation: range alternations are the one spot
    # where regex engines diverge; a scrub stage prefers recall
    ("ipv4", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # separators required, so bare long digit runs fall through to id;
    # country/area prefix optional so local 3-3-4 numbers still match
    (
        "phone",
        r"(\+?[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
        "<PHONE>",
    ),
    ("id", r"\b[0-9]{9,16}\b", "<ID>"),
]


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact the PII classes from `text_col` and count what each
    class removed.  Returns (id, redacted, n_<class>..., n_pii).

    The redacted text is staged as ONE column; counts are literal
    placeholder-token occurrences over it (length arithmetic), so the
    five regexes each appear exactly once in the plan."""
    red = F.coalesce(F.col(text_col), F.lit(""))
    for _, pattern, token in PII_CLASSES:
        red = F.regexp_replace(red, pattern, token)
    staged = df.select(F.col(id_col), red.alias("redacted"))

    def tok_count(token: str):
        return (
            (
                F.length("redacted")
                - F.length(F.replace(F.col("redacted"), F.lit(token)))
            )
            / len(token)
        ).cast("long")

    counts = [
        tok_count(token).alias(f"n_{name}")
        for name, _, token in PII_CLASSES
    ]
    out = staged.select(F.col(id_col), F.col("redacted"), *counts)
    total = sum(
        (F.col(f"n_{name}") for name, _, _ in PII_CLASSES),
        F.lit(0).cast("long"),
    )
    return out.withColumn("n_pii", total)
