"""HTML main-content extraction: boilerplate strip + density
heuristics — the web-document leg of main-content extraction (the
north rule names "HTML boilerplate strip, DOM heuristics" alongside
the PDF/OCR chain).

A full DOM parse is not expressible in built-in column functions, but
the heuristics that production boilerplate removal actually relies on
(readability/trafilatura-style) are:

1. drop <script>/<style> subtrees;
2. segment the page into BLOCKS at block-level closing tags
   (p/div/nav/footer/article/section/h1-6/li);
3. per block, compare visible text length against the length of text
   inside <a> anchors — navigation, ad and footer blocks are short
   and/or link-dense, article prose is long and link-sparse;
4. keep blocks with text_len >= min_text_len and link_density <=
   max_link_density; join them in document order.

Every step is a regexp/array column expression (whole-stage codegen,
zero Python, one pass per document — the shape that survives a
100 TB crawl), and every regex is RE2-compatible (no backreferences,
no lookarounds) so the DuckDB oracle replays the pipeline exactly.

The `synth_html` wrapper builds a deterministic page (head + nav +
ad block + article + footer) around a document's text, closed-form
over (doc_id, text) on both engines — the same counter-block
convention the multimodal payloads use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BLOCK_SPLIT_RE = r"</(?:p|div|nav|footer|article|section|h[1-6]|li)>"
TAG_RE = r"<[^>]*>"
ANCHOR_RE = r"(?s)<a[^>]*>(.*?)</a>"

# readability-style DOM hints: structural tags / class-id naming that
# mark navigation & chrome vs. article prose (RE2-safe, shared with
# the oracle verbatim)
NEG_HINT_RE = (
    r'(?i)<(?:nav|footer|aside)[\s>]'
    r'|(?:class|id)="[^"]*(?:nav|foot|side|ad|promo|comment)'
)
POS_HINT_RE = (
    r'(?i)<(?:article|main)[\s>]'
    r'|(?:class|id)="[^"]*(?:article|content|main|post)'
)


def synth_html(doc_id: Column, text: Column) -> Column:
    """Deterministic HTML page around a document's text: title + nav
    (link-dense), an ad block (link-dense), the article body (one long
    <p> + one short tail <p>), and a footer (link-dense)."""
    words = F.split(text, " ")
    tail = F.array_join(F.slice(words, 1, 5), " ")
    return F.concat(
        F.lit("<html><head><title>Doc "),
        doc_id.cast("string"),
        F.lit(
            "</title><style>body {margin:0}</style>"
            '<script>var tracker = "x";</script></head><body>'
            '<nav><a href="/">Home</a> <a href="/a">About</a> '
            '<a href="/c">Contact</a></nav>'
            '<div>Buy <a href="/buy">cheap deals now</a> '
            '<a href="/o">limited offer today</a></div>'
            "<article><p>"
        ),
        text,
        F.lit("</p><p>Short tail: "),
        tail,
        F.lit(
            '</p></article><footer><a href="/t">Terms of service</a> '
            '<a href="/p">Privacy policy</a></footer></body></html>'
        ),
    )


def _visible(block: Column) -> Column:
    """Block -> collapsed visible text (tags stripped)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(block, TAG_RE, " "), r"\s+", " "
        )
    )


def _link_text(block: Column) -> Column:
    """Concatenated collapsed text inside the block's anchors."""
    return F.trim(
        F.regexp_replace(
            F.array_join(
                F.regexp_extract_all(block, F.lit(ANCHOR_RE), 1), " "
            ),
            r"\s+",
            " ",
        )
    )


def extract_main_content_scored(
    html: Column, min_score: int = 25
) -> Column:
    """Readability-style scored variant of main-content extraction:
    instead of hard text-length / link-density cutoffs, each block
    gets an additive score

        score = visible_chars - 3 * link_chars
                + 30 * positive_DOM_hint - 30 * negative_DOM_hint

    where the hints are the structural-tag / class-id patterns
    (<article>/<main>/content-ish names up, <nav>/<footer>/<aside>/
    ad-ish names down) that real boilerplate removers weight.  Blocks
    scoring >= min_score are kept in document order.  Same execution
    shape as the cutoff variant: one regex pass per block, pure
    codegen, no Python.  Returns (main_text, n_blocks_kept,
    n_blocks_total, boilerplate_chars, top_score)."""
    no_script = F.regexp_replace(
        html, r"(?s)<script[^>]*>.*?</script>", " "
    )
    clean = F.regexp_replace(
        no_script, r"(?s)<style[^>]*>.*?</style>", " "
    )
    blocks = F.split(clean, BLOCK_SPLIT_RE)
    # two-stage transform so the per-block regex chains (_visible,
    # _link_text) run ONCE each; referencing them twice inside one
    # lambda (t + length(t)) would re-evaluate the regex per use —
    # HOF lambdas are interpreted with no subexpression elimination
    staged = F.transform(
        blocks,
        lambda b: F.struct(
            _visible(b).alias("t"),
            _link_text(b).alias("lt"),
            b.rlike(POS_HINT_RE).cast("int").alias("pos"),
            b.rlike(NEG_HINT_RE).cast("int").alias("neg"),
        ),
    )
    scored = F.transform(
        staged,
        lambda s: F.struct(
            s["t"].alias("t"),
            F.length(s["t"]).alias("n"),
            (
                F.length(s["t"])
                - 3 * F.length(s["lt"])
                + 30 * s["pos"]
                - 30 * s["neg"]
            ).alias("sc"),
        ),
    )
    # ONE fold over the scored blocks computes every output field —
    # the keep/drop/total arrays each referenced the scored chain
    # separately (6 full evaluations of the regex pipeline per row);
    # the finish lambda renames fields off the accumulator, which is
    # evaluated once.  String order and types are the array_join
    # semantics exactly (kept blocks joined with one space, in
    # document order; top_score 0 when nothing kept).
    kept_f = lambda s: (s["n"] > 0) & (s["sc"] >= min_score)  # noqa: E731
    init = F.struct(
        F.lit("").alias("mt"),
        F.lit(0).cast("long").alias("nk"),
        F.lit(0).cast("long").alias("nt"),
        F.lit(0).cast("long").alias("bp"),
        F.lit(None).cast("long").alias("top"),
    )

    def step(acc, s):
        kept = kept_f(s)
        dropped = (s["n"] > 0) & (s["sc"] < min_score)
        return F.struct(
            F.when(
                kept & (acc["nk"] > 0),
                F.concat(acc["mt"], F.lit(" "), s["t"]),
            )
            .when(kept, s["t"])
            .otherwise(acc["mt"])
            .alias("mt"),
            (acc["nk"] + kept.cast("long")).alias("nk"),
            (acc["nt"] + (s["n"] > 0).cast("long")).alias("nt"),
            (
                acc["bp"]
                + F.when(dropped, s["n"].cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("bp"),
            F.when(
                kept, F.greatest(acc["top"], s["sc"].cast("long"))
            )
            .otherwise(acc["top"])
            .alias("top"),
        )

    return F.aggregate(
        scored,
        init,
        step,
        lambda acc: F.struct(
            acc["mt"].alias("main_text"),
            acc["nk"].alias("n_blocks_kept"),
            acc["nt"].alias("n_blocks_total"),
            acc["bp"].alias("boilerplate_chars"),
            F.coalesce(acc["top"], F.lit(0).cast("long")).alias(
                "top_score"
            ),
        ),
    )


def extract_main_content(
    html: Column,
    min_text_len: int = 25,
    max_link_density: float = 0.34,
) -> Column:
    """Main text of an HTML page as a struct:
    (main_text, n_blocks_kept, n_blocks_total, boilerplate_chars).

    `boilerplate_chars` counts the visible characters the heuristics
    DISCARDED — the accounting signal (same "no silent drops"
    discipline as the dedup caps)."""
    no_script = F.regexp_replace(
        html, r"(?s)<script[^>]*>.*?</script>", " "
    )
    clean = F.regexp_replace(
        no_script, r"(?s)<style[^>]*>.*?</style>", " "
    )
    blocks = F.split(clean, BLOCK_SPLIT_RE)
    # staged t/lt once per block, then lengths off the struct fields —
    # and ONE fold for every output field (see the scored variant for
    # the rationale: HOF lambdas re-evaluate repeated sub-expressions,
    # and the keep/drop/total arrays each re-ran the whole chain)
    staged = F.transform(
        blocks,
        lambda b: F.struct(
            _visible(b).alias("t"), _link_text(b).alias("lt")
        ),
    )
    scored = F.transform(
        staged,
        lambda s: F.struct(
            s["t"].alias("t"),
            F.length(s["t"]).alias("n"),
            F.length(s["lt"]).alias("ln"),
        ),
    )
    init = F.struct(
        F.lit("").alias("mt"),
        F.lit(0).cast("long").alias("nk"),
        F.lit(0).cast("long").alias("nt"),
        F.lit(0).cast("long").alias("bp"),
    )

    def step(acc, s):
        kept = (s["n"] >= min_text_len) & (
            (s["ln"] / s["n"]) <= max_link_density
        )
        dropped = (s["n"] > 0) & ~kept
        return F.struct(
            F.when(
                kept & (acc["nk"] > 0),
                F.concat(acc["mt"], F.lit(" "), s["t"]),
            )
            .when(kept, s["t"])
            .otherwise(acc["mt"])
            .alias("mt"),
            (acc["nk"] + kept.cast("long")).alias("nk"),
            (acc["nt"] + (s["n"] > 0).cast("long")).alias("nt"),
            (
                acc["bp"]
                + F.when(dropped, s["n"].cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("bp"),
        )

    return F.aggregate(
        scored,
        init,
        step,
        lambda acc: F.struct(
            acc["mt"].alias("main_text"),
            acc["nk"].alias("n_blocks_kept"),
            acc["nt"].alias("n_blocks_total"),
            acc["bp"].alias("boilerplate_chars"),
        ),
    )
