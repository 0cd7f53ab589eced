"""Pins for the latent negative-zero hash hazard (SURVEY §7.7, VERDICT
r09 item 6) and the driver-leg mismatch classifier (ADVICE r09).

The hazard: ``f"{-0.0:.6f}"`` renders ``-0.000000``, so if Spark and
DuckDB ever disagree on the SIGN of a rounded zero (summation-order
artifacts can produce ``-0.0``), the value hash mismatches even though
the values compare equal. Policy: the canonicalizer must KEEP
detecting it (the local harness stays at least as strict as the
driver's); a firing is fixed at the query level (``abs()`` guard or
``+ 0.0`` in BOTH twins), never by loosening the comparator. These
tests pin (a) that the hazard stays detectable in both comparator
legs, (b) that the structural precondition — a ROUND over a SUM — is
an enumerable, committed watch-list rather than an anecdote, and (c)
that order-only raw-sort ties are classified as such instead of being
misreported as value diffs.

Pure-python: no Spark session needed.
"""

from __future__ import annotations

import ast
import inspect
import os
import re
import sys
import textwrap

import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from frauddetection_spark.oracle import (  # noqa: E402
    _canon_frame,
    driver_canon_frame,
    driver_leg_mismatch_kind,
)

WATCHLIST = os.path.join(_REPO, "NEGZERO_WATCHLIST.txt")


def test_negative_zero_stays_detectable_in_both_legs():
    # the hazard is real and must STAY detectable: -0.0 vs 0.0 renders
    # differently through _canon_cell, so both comparator legs mismatch
    a = pd.DataFrame({"k": ["x"], "v": [0.0]})
    b = pd.DataFrame({"k": ["x"], "v": [-0.0]})
    assert _canon_frame(a) != _canon_frame(b)
    assert driver_canon_frame(a) != driver_canon_frame(b)
    # and the classifier calls it a VALUE diff (the rendered rows
    # really differ — this is not a raw-sort tie)
    kind = driver_leg_mismatch_kind(driver_canon_frame(a), driver_canon_frame(b))
    assert kind == "value diff"


def test_order_only_raw_sort_tie_classified_as_such():
    # ADVICE r09: sub-tolerance float drift on near-tied rows can order
    # the two frames differently while every RENDERED row matches —
    # the classifier must say order-only, not value diff
    # "amt" sorts before "tag", so the raw float column drives the
    # driver-leg row order; the two values differ only below 6dp
    a = pd.DataFrame({"amt": [1.0000000001, 0.9999999999], "tag": ["b", "a"]})
    b = pd.DataFrame({"amt": [1.0000000001, 0.9999999999], "tag": ["a", "b"]})
    da, db = driver_canon_frame(a), driver_canon_frame(b)
    assert da != db  # raw sort put the 6dp-identical rows in different order
    assert sorted(da) == sorted(db)
    assert driver_leg_mismatch_kind(da, db).startswith("order-only")


# every spelling of "round this" in the repo: F.round plus the _util
# helpers that wrap it (r6 = F.round(·, 6); review r10 found r6 was a
# blind spot — 34 call sites rounded through it invisibly to a lint
# that only matched the literal name "round")
_ROUNDERS = {"round", "r6"}


def _round_of_sum_spark(fn) -> bool:
    """ast leg of the watch-list lint: any Call named like a rounder
    (``F.round`` or the ``r6`` helper) whose argument tree contains a
    Call named ``sum`` (however deeply nested in arithmetic)."""
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):
        return False

    def callee(node):
        f = node.func
        if isinstance(f, ast.Attribute):
            return f.attr
        if isinstance(f, ast.Name):
            return f.id
        return None

    for node in ast.walk(tree):
        if isinstance(node, ast.Call) and callee(node) in _ROUNDERS:
            for sub in ast.walk(node):
                if sub is not node and isinstance(sub, ast.Call):
                    if callee(sub) == "sum":
                        return True
    return False


# SQL leg: ROUND and SUM co-present ANYWHERE in the twin (not
# ROUND-textually-before-SUM — review r10: a sum computed in a CTE and
# rounded in the outer SELECT evaded the forward-only pattern). A
# watch-list over-approximates by design.
_SQL_ROUND = re.compile(r"\bROUND\s*\(", re.IGNORECASE)
_SQL_SUM = re.compile(r"\bSUM\s*\(", re.IGNORECASE)


def _round_of_sum_sql(sql: str) -> bool:
    return bool(_SQL_ROUND.search(sql)) and bool(_SQL_SUM.search(sql))


def test_round_of_sum_watchlist_matches_committed_file():
    # the watch-list is ENUMERABLE, not anecdotal: recompute the set of
    # queries whose Spark plan or DuckDB twin rounds over a sum and
    # pin it to the committed NEGZERO_WATCHLIST.txt — any new
    # round-of-sum site must land there (and get eyeballed) in the
    # same commit that introduces it
    from rotate_window import unwrap_query_fn

    from frauddetection_spark.plans.registry import load_all

    reg = load_all()
    computed = sorted(
        name
        for name, spec in reg.items()
        if _round_of_sum_spark(unwrap_query_fn(spec.fn))
        or (spec.oracle and _round_of_sum_sql(spec.oracle))
    )
    with open(WATCHLIST) as fh:
        committed = [
            ln.strip()
            for ln in fh
            if ln.strip() and not ln.startswith("#")
        ]
    assert computed == committed, (
        "round-of-sum watch-list drifted — regenerate "
        "NEGZERO_WATCHLIST.txt (see its header) and review the new "
        f"entries; computed-not-committed: "
        f"{sorted(set(computed) - set(committed))}, "
        f"committed-not-computed: {sorted(set(committed) - set(computed))}"
    )


def test_negzero_immunity_rules():
    """Pins the three IEEE-754 facts the round-13 headline triage in
    NEGZERO_WATCHLIST.txt relies on (if a runtime/libm ever broke
    these, the immunity argument for the 17 headline entries would be
    void and this test names exactly which clause fell):

    (a) an integer zero cast to double is +0.0 — int-exact sums
        (cents / e-4 dollars / 1e-6 quantized) can never surface -0.0;
    (b) addition yields -0.0 only when EVERY addend is -0.0;
        positive/negative cancellation and x-x give +0.0 under
        round-to-nearest, so float sums of signable terms are safe
        unless individual terms are already -0.0;
    (c) the -0.0 entry points are sign-asymmetric products/quotients
        and unary minus on zero — the constructs the triage verified
        absent from both twins of every headline entry.
    """
    import math

    def neg(v: float) -> bool:
        return v == 0.0 and math.copysign(1.0, v) < 0

    # (a) integer zero -> +0.0
    assert not neg(float(0))
    assert not neg(float(5 + (-5)))
    # (b) sums: cancellation is +0.0; only all--0.0 addends go negative
    assert not neg(5.0 + (-5.0))
    assert not neg(3.7 - 3.7)
    assert not neg(sum([1.5, -1.5, 2.0, -2.0]))
    assert neg(-0.0 + -0.0)
    # (builtin sum() seeds with int 0, so sum([-0.0, -0.0]) is +0.0 —
    # engine column-sums fold pairwise over the values with no integer
    # seed, which is why the all--0.0-addends case matters there)
    # (c) the true entry points
    assert neg(0.0 * -1.0)
    assert neg(0.0 / -4.0)
    assert neg(-(0.0))
