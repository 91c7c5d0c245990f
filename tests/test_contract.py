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
    """Rotation invariant: every query EVER driver-checked must appear
    either in the LAST round's CORRECTNESS file or inside the front
    window the driver will check THIS round (first 50 entries) — no
    previously-checked query drifts more than two rounds from a hard
    driver check.  BRAND-NEW queries (in no CORRECTNESS file yet) go
    in the window too, except when stale + new exceed the 50-slot
    window: then the overflow must (a) be new-only — stale queries
    always win a slot — and (b) sit IMMEDIATELY after the window so
    the overflow leads the next round's window.  (Every query is also
    oracle-checked in-suite each pytest run by test_entry_oracle.)"""
    import json
    import re

    files = sorted(
        f
        for f in os.listdir(REPO)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    assert files, "no CORRECTNESS files found"
    last = set(json.load(open(os.path.join(REPO, files[-1]))))
    ever = set()
    for f in files:
        ever |= set(json.load(open(os.path.join(REPO, f))))
    order = list(entry_mod.queries())
    window = set(order[:50])
    overdue = [
        n for n in order
        if n in ever and n not in last and n not in window
    ]
    assert not overdue, (
        f"previously-checked queries neither checked last round nor "
        f"in this round's window: {overdue}"
    )
    new_overflow = [
        i for i, n in enumerate(order)
        if n not in ever and n not in window
    ]
    if new_overflow:
        n_stale_or_new = sum(
            1 for n in order if n not in last or n not in ever
        )
        assert n_stale_or_new > 50, (
            "new queries left outside the window even though it "
            f"had room: {[order[i] for i in new_overflow]}"
        )
        want = list(range(50, 50 + len(new_overflow)))
        assert new_overflow == want, (
            f"window-overflow new queries must sit immediately after "
            f"the window (positions {want}), got {new_overflow}"
        )
