"""Registry invariants for the driver contract: catching drift between
queries(), oracle_sql(), and the documented rows-only allowlist before the
round driver does."""

import re

import __spark_entry__ as entry

# queries that legitimately have no DuckDB oracle, each inherently so:
# r9b (HLL internals), s2 (DataSource scan), x5/x6 (xxhash64 outputs —
# DuckDB has no xxhash64)
ROWS_ONLY = {"r9b_approx_distinct", "s2_granule_scan",
             "x5_minhash_pairs", "x6_simhash_pairs"}


def test_oracle_keys_subset_of_queries():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    assert set(qs) - set(osql) == ROWS_ONLY


def test_rotation_orders_unrecorded_queries_first():
    """CLAUDE.md rule 7: every query with no row in any committed
    CORRECTNESS_r*.json must precede every already-recorded query in
    queries() dict order, so the driver's 50-slot window always captures
    all unrecorded queries before spending slots on re-confirmation.
    (Once fewer than 50 unrecorded remain, recorded queries legitimately
    fill the window's tail.)"""
    import glob
    import json

    recorded = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        recorded |= set(json.load(open(path)))
    qs = list(entry.queries())
    first_recorded = next((i for i, q in enumerate(qs) if q in recorded), len(qs))
    stragglers = [q for q in qs[first_recorded:] if q not in recorded]
    assert not stragglers, (
        f"unrecorded queries ordered after recorded ones: {stragglers}"
    )


def test_coverage_mentions_every_extension_query():
    """Every x/s query id must be traceable in COVERAGE.md (the judge's
    line-by-line map)."""
    cov = open("/root/repo/COVERAGE.md").read()
    for name in entry.queries():
        if name[0] in "xs":
            qid = name.split("_")[0]  # x51, s8, ...
            assert re.search(rf"\b{qid}\b", cov), f"{qid} missing from COVERAGE.md"


def test_readme_query_count_in_sync():
    readme = open("/root/repo/README.md").read()
    n = len(entry.queries())
    assert f"{n} queries" in readme, f"README query count != {n}"
