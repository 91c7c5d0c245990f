"""URL canonicalization and registered-domain extraction — the
web-corpus grouping keys every crawl pipeline needs before dedup,
per-site quotas, or domain-level quality scores.

Normalization applied (the common-crawl-style canonical form):
lowercase scheme and host, strip default ports (:80 http / :443
https), drop the fragment, remove tracking parameters (utm_*, fbclid,
gclid, ref), sort the surviving query parameters, and strip a
trailing slash from non-root paths.  Path case and non-default ports
are preserved — paths are case-sensitive per RFC 3986.

The registered domain uses a built-in two-level-suffix table (the
public-suffix-list idea reduced to the common second-level suffixes;
swap in the full PSL as a broadcast table for production crawls).

Everything is regexp/array codegen — zero shuffle, zero Python, one
scan; expressions are staged as real columns per select so Catalyst's
CollapseProject cannot inline any regex N times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# second-level public suffixes where the registered domain is the
# last THREE labels
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "org.uk", "gov.uk", "com.au", "net.au",
    "co.jp", "com.br", "co.in", "com.cn", "co.nz", "com.mx",
)

_TRACKING_RE = "^(utm_[^=]*|fbclid|gclid|ref)="


def normalize_urls(
    df: DataFrame, url_col: str = "url", keep: tuple[str, ...] = ()
) -> DataFrame:
    """One output row per input row: (url, norm_url, host,
    registered_domain, n_params) — norm_url the canonical form, host
    the lowercased port-less hostname.  `keep` names extra input
    columns carried through verbatim (ids, quality scores) so
    downstream per-URL aggregation needs no join back."""
    out = df.select(
        *keep,
        F.col(url_col).alias("url"),
        F.lower(
            F.regexp_extract(F.col(url_col), "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
        ).alias("_scheme"),
        F.lower(
            F.regexp_extract(
                F.col(url_col), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1
            )
        ).alias("_auth"),
        F.regexp_extract(
            F.col(url_col),
            "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)",
            1,
        ).alias("_rawpath"),
        F.regexp_extract(F.col(url_col), "\\?([^#]*)", 1).alias("_rawq"),
    )
    out = out.select(
        *keep,
        "url",
        "_scheme",
        F.regexp_replace(F.col("_auth"), ":[0-9]+$", "").alias("_host"),
        F.regexp_extract(F.col("_auth"), ":([0-9]+)$", 1).alias("_port"),
        F.when(F.col("_rawpath") == "", F.lit("/"))
        .otherwise(
            F.when(
                (F.length(F.col("_rawpath")) > 1)
                & F.col("_rawpath").endswith("/"),
                F.expr("substring(_rawpath, 1, length(_rawpath) - 1)"),
            ).otherwise(F.col("_rawpath"))
        )
        .alias("_path"),
        F.array_sort(
            F.filter(
                F.split(F.col("_rawq"), "&"),
                lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_RE),
            )
        ).alias("_params"),
    )
    out = out.select(
        *keep,
        "url",
        "_scheme",
        "_host",
        # default ports vanish; everything else is kept verbatim
        F.when(
            ((F.col("_scheme") == "http") & (F.col("_port") == "80"))
            | ((F.col("_scheme") == "https") & (F.col("_port") == "443"))
            | (F.col("_port") == ""),
            F.lit(""),
        )
        .otherwise(F.concat(F.lit(":"), F.col("_port")))
        .alias("_portseg"),
        "_path",
        F.size(F.col("_params")).alias("n_params"),
        F.when(F.size(F.col("_params")) > 0, F.concat(F.lit("?"),
               F.concat_ws("&", F.col("_params"))))
        .otherwise(F.lit(""))
        .alias("_qseg"),
        F.split(F.col("_host"), "\\.").alias("_labels"),
    )
    n = F.size(F.col("_labels"))
    last2 = F.concat_ws(
        ".", F.slice(F.col("_labels"), F.greatest(n - 1, F.lit(1)), F.lit(2))
    )
    last3 = F.concat_ws(
        ".", F.slice(F.col("_labels"), F.greatest(n - 2, F.lit(1)), F.lit(3))
    )
    return out.select(
        *keep,
        "url",
        F.concat(
            F.col("_scheme"),
            F.lit("://"),
            F.col("_host"),
            F.col("_portseg"),
            F.col("_path"),
            F.col("_qseg"),
        ).alias("norm_url"),
        F.col("_host").alias("host"),
        F.when(
            (n >= 3) & last2.isin(*TWO_LEVEL_SUFFIXES), last3
        )
        .when(n >= 2, last2)
        .otherwise(F.col("_host"))
        .alias("registered_domain"),
        "n_params",
    )


def url_dedup_best(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Canonical-URL deduplication keeping the best document per URL
    — the crawl-consolidation step: the same page fetched many times
    (mirrors, tracking-param variants, trailing-slash variants)
    collapses to one representative, chosen by highest quality score
    with the LARGEST id as the deterministic tie-break (max over a
    (score, id) struct).  Output, one row per canonical URL:
    (norm_url, registered_domain, n_docs, best_doc_id, best_score).

    Scale shape: normalization is pure codegen on the single scan
    (`normalize_urls` with the id/score carried through — no join
    back); the collapse is ONE hash aggregation on norm_url with
    map-side partial combine, so a URL crawled a million times
    arrives at the shuffle as one partial row per map task.  The
    arg-max is max(struct(score, id)) — folded into the same
    aggregation, no window, no second pass."""
    n = normalize_urls(df, url_col, keep=(id_col, score_col))
    return (
        n.groupBy("norm_url")
        .agg(
            F.first("registered_domain").alias("registered_domain"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max(
                F.struct(
                    F.col(score_col).alias("s"), F.col(id_col).alias("i")
                )
            ).alias("_best"),
        )
        .select(
            "norm_url",
            "registered_domain",
            "n_docs",
            F.col("_best.i").alias("best_doc_id"),
            F.col("_best.s").alias("best_score"),
        )
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    score_col: str = "quality",
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """Per-registered-domain curation profile — the domain-level
    quality pass every web corpus runs before per-site quotas: a
    domain whose pages are uniformly low-quality (content farms,
    link spam) is dropped wholesale, which no per-document filter
    can decide.  Output, one row per surviving domain:
    (registered_domain, n_docs, n_urls, mean_quality, min_quality,
    max_quality) with `n_urls` the distinct canonical-URL count
    (n_docs >> n_urls flags a domain that is mostly refetches).

    Scale shape: normalization rides the single scan; the blocklist
    is a literal `isin` pushed into the scan-side filter (swap in a
    broadcast anti-join for a real PSL-sized list); the distinct-URL
    count is a two-level aggregation — (domain, norm_url) partial
    first, then domain — so no count-distinct state explosion; every
    aggregate is map-side combined."""
    n = normalize_urls(df, url_col, keep=(score_col,))
    if blocklist:
        n = n.filter(~F.col("registered_domain").isin(*blocklist))
    per_url = n.groupBy("registered_domain", "norm_url").agg(
        F.count(F.lit(1)).alias("_docs"),
        F.sum(score_col).alias("_qsum"),
        F.min(score_col).alias("_qmin"),
        F.max(score_col).alias("_qmax"),
    )
    return per_url.groupBy("registered_domain").agg(
        F.sum("_docs").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.round(F.sum("_qsum") / F.sum("_docs"), 6).alias("mean_quality"),
        F.min("_qmin").cast("long").alias("min_quality"),
        F.max("_qmax").cast("long").alias("max_quality"),
    )
