"""Driver-contract integrity: the shapes the correctness harness assumes.

These are import-time checks (no Spark execution) — they catch the drift
class where a query is added without its oracle entry, an oracle names a
query that no longer exists, or a query function loses its UTC wrapper.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

# rows-only queries must be a deliberate, named set — anything else
# missing an oracle is an accident. EMPTY since round 3: every query
# (image_features included) now has a full rows+schema+hash oracle.
ROWS_ONLY_ALLOWED: set[str] = set()


def test_every_query_has_oracle_or_is_whitelisted():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = set(qs) - set(oracles)
    assert missing == ROWS_ONLY_ALLOWED, (
        f"queries without oracle SQL: {sorted(missing)} "
        f"(whitelist: {sorted(ROWS_ONLY_ALLOWED)})"
    )


def test_no_orphan_oracles():
    orphans = set(entry.oracle_sql()) - set(entry.queries())
    assert not orphans, f"oracle entries with no query: {sorted(orphans)}"


def test_queries_are_utc_wrapped_and_documented():
    for name, fn in entry.queries().items():
        assert fn.__name__ == f"q_{name}", (
            f"{name}: wrapper lost the function identity"
        )


def test_oracle_sql_is_nonempty_select():
    for name, sql in entry.oracle_sql().items():
        s = sql.strip().lower()
        assert s.startswith(("select", "with")), f"{name}: not a query"
        assert len(s) > 20, f"{name}: suspiciously short oracle"
