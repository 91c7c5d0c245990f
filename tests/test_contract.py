"""Driver-contract invariants (no Spark session needed).

The driver checks a window from the FRONT of ``queries()`` each round,
so the registration itself has to stay honest as the surface grows:
every query needs an oracle (or a deliberate rows-only note), and the
COVERAGE.md operator map must mention every registered query so the
judge's line-by-line check can find it.
"""

import os

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_an_oracle():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    # no orphan oracle (a renamed query would silently lose its check)
    assert oracles <= qs, sorted(oracles - qs)
    # every query is oracle-checked; if a future op is genuinely not
    # SQL-expressible, list it here explicitly instead of loosening
    rows_only_allowed: set[str] = {
        # HLL sketch binaries/estimates aren't replayable in DuckDB;
        # accuracy + merge-consistency + plan are pinned in-suite
        # (test_hypertable_distinct_rollup_*)
        "sketch_rollup",
    }
    assert qs - oracles <= rows_only_allowed, sorted(qs - oracles)


def test_coverage_map_mentions_every_query():
    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = sorted(n for n in entry_mod.queries() if n not in cov)
    assert not missing, f"COVERAGE.md is missing queries: {missing}"


def test_no_query_goes_two_rounds_unchecked():
    """Rotation invariant: every registered query must appear either
    in the LAST round's CORRECTNESS file or inside the front window
    the driver will check THIS round (first 50 entries) — i.e. no
    query is ever more than two rounds away from a hard driver check.
    New queries (in neither prior file) must be in the front window."""
    import json
    import re

    files = sorted(
        f
        for f in os.listdir(REPO)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    assert files, "no CORRECTNESS files found"
    last = set(json.load(open(os.path.join(REPO, files[-1]))))
    order = list(entry_mod.queries())
    window = set(order[:50])
    stale = [n for n in order if n not in last and n not in window]
    assert not stale, (
        f"queries neither checked last round nor in this round's "
        f"window: {stale}"
    )
