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


def test_rotation_window_holds_the_most_overdue_queries():
    """Rotation invariant, prefix form: rank every query by staleness
    — queries with no hard-GREEN driver check first (a FAILED or
    ERRed CORRECTNESS row is zero validation, so the key is the last
    GREEN round, not the last attempted one; the in-suite DuckDB
    mirror re-checks everything each pytest run, but the driver is
    authoritative), then ascending by the round of the last green
    check.  Rows-only queries (sketch_rollup) are excluded from the
    ranking: the driver errs `no_oracle` on them every time, so a
    window slot spent on one is a known-err row, never a validation.
    The driver's front-50 window must be a PREFIX of that ranking:
    no ranked query outside the window may be strictly more overdue
    than any ranked query inside it.  When more than 50 queries tie
    at the boundary the choice among equals is free, and the
    overflow naturally leads the next round's window."""
    import json
    import re

    files = sorted(
        f
        for f in os.listdir(REPO)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    assert files, "no CORRECTNESS files found"
    rows_only = {"sketch_rollup"}
    last_green: dict[str, int] = {}
    for f in files:
        rnd = int(re.search(r"r(\d+)", f).group(1))
        for name, row in json.load(open(os.path.join(REPO, f))).items():
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") in (True, None)
                and row.get("err") is None
            )
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)

    order = [n for n in entry_mod.queries() if n not in rows_only]
    if len(order) <= 50:
        return
    key = lambda n: last_green.get(n, -1)  # noqa: E731
    worst_in = max(order[:50], key=key)
    best_out = min(order[50:], key=key)
    assert key(worst_in) <= key(best_out), (
        f"rotation violated: {best_out!r} (last green "
        f"r{key(best_out)}) sits outside the driver window while "
        f"{worst_in!r} (last green r{key(worst_in)}) holds a slot"
    )
