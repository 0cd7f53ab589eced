"""PLANS.md freshness pins (VERDICT r12: the explain-audit artifact
shipped stale for two headline plan changes).

The EXPENSIVE half of the guard — recomputing every headline plan and
comparing structural fingerprints — runs at close-out via
``python plans_audit.py --check`` (a Spark session + ~36 plan builds
doesn't belong in the suite's wall-time budget). These tests pin the
cheap invariants that catch the silent-drift entry points without a
session:

- every current HEADLINE query has a fingerprinted section (adding or
  renaming a headline query without regenerating PLANS.md fails here);
- the fingerprint parser round-trips the committed file (a format
  change that would make --check vacuously pass is caught);
- the fingerprint function itself is order/codegen-id-insensitive but
  operator-sensitive (so --check compares what it claims to).
"""

from __future__ import annotations

import plans_audit
from bench import HEADLINE


def test_every_headline_query_has_committed_fingerprint():
    committed = plans_audit.committed_fingerprints()
    missing = [n for n in HEADLINE if n not in committed]
    assert not missing, (
        f"PLANS.md has no fingerprinted section for {missing} — "
        "regenerate with `python plans_audit.py`"
    )


def test_committed_fingerprints_parse_nonempty_hex():
    committed = plans_audit.committed_fingerprints()
    assert len(committed) >= len(HEADLINE)
    for name, fp in committed.items():
        assert len(fp) == 12 and int(fp, 16) >= 0, (name, fp)


def test_fingerprint_structural_semantics():
    plan_a = (
        "== Physical Plan ==\n* HashAggregate (3)\n+- Exchange (2)\n"
        "   +- Scan parquet  (1)\n\n\n(1) Scan parquet \nOutput: [x]\n\n"
        "(2) Exchange\nArguments: hashpartitioning(x, 8)\n\n"
        "(3) HashAggregate [codegen id : 1]\nKeys: [x]\n"
    )
    # same operators, different codegen id + partition count -> equal
    plan_b = plan_a.replace("codegen id : 1", "codegen id : 7").replace(
        "hashpartitioning(x, 8)", "hashpartitioning(x, 32)"
    )
    assert plans_audit.fingerprint(plan_a) == plans_audit.fingerprint(plan_b)
    # an operator swap -> different
    plan_c = plan_a.replace("(3) HashAggregate", "(3) SortAggregate")
    assert plans_audit.fingerprint(plan_a) != plans_audit.fingerprint(plan_c)
