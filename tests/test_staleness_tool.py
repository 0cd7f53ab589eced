"""Pins for rotate_window.py's import-deep staleness scan (VERDICT r09
item 3): the function-level ``git log -L`` leg dates only a query's own
body, so the r09 connected_components gate refactor in
operators/graph.py never flagged its consumer queries — their green
rows silently described a plan built on a different helper. The scan
now walks ONE import level: every package-defined function a query's
defining function calls is dated too, and the first helper committed
after the query's green artifact flags it.

Pure-python + ast + monkeypatched git: no Spark session needed.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import rotate_window  # noqa: E402
from rotate_window import helpers_of, unwrap_query_fn  # noqa: E402

CC_CONSUMERS = {
    "q_connected_components",
    "q_dedup_groups",
    "q_dedup_semantic",
    "q_entity_resolution",
}


def _registry():
    from frauddetection_spark.plans.registry import load_all

    return load_all()


def test_helpers_of_resolves_shared_operators():
    # the exact r09 gap: CC consumers must surface their dependence on
    # operators/graph.py::connected_components
    reg = _registry()
    for name in CC_CONSUMERS:
        fn = unwrap_query_fn(reg[name].fn)
        helpers = dict(helpers_of(fn))
        assert helpers.get("connected_components") == os.path.join(
            "frauddetection_spark", "operators", "graph.py"
        ), f"{name} does not surface connected_components as a helper"


def test_helpers_of_excludes_registration_decorator():
    # @register(...) is a Call node in the source but not part of the
    # built plan; resolving it as a helper would stale all 309 queries
    # on any registry.py commit (240/259 flags in the first r10 scan)
    reg = _registry()
    for name in ("q_groupby_agg", "q_dedup_groups", "q_item_cf"):
        fn = unwrap_query_fn(reg[name].fn)
        rels = {rel for _, rel in helpers_of(fn)}
        assert not any(rel.endswith("registry.py") for rel in rels), (
            f"{name} resolves plans/registry.py as a helper"
        )


def test_staleness_flags_cc_consumers_on_helper_only_change(monkeypatch):
    # simulate the r09 situation mechanically: every query body and
    # every helper predates its green artifact EXCEPT
    # connected_components, which postdates all of them — the scan
    # must flag exactly the CC consumers, each with a helper reason
    cc_rel = os.path.join("frauddetection_spark", "operators", "graph.py")

    def fake_func_time(repo, funcname, rel):
        if funcname == "connected_components" and rel == cc_rel:
            return 10_000
        return 1

    monkeypatch.setattr(rotate_window, "_git_func_time", fake_func_time)
    monkeypatch.setattr(
        rotate_window, "_git_artifact_time", lambda repo, path: 100
    )
    monkeypatch.setattr(
        rotate_window, "_git_const_time", lambda repo, name, rel: 1
    )
    flagged = rotate_window.staleness()
    helper_flagged = {
        name for name, _, why in flagged if "helper" in why
    }
    assert helper_flagged == CC_CONSUMERS
    for name, _, why in flagged:
        if name in CC_CONSUMERS:
            assert "connected_components" in why
    # and nothing else was flagged spuriously by the fake clock
    body_flagged = [
        (name, why) for name, _, why in flagged if "helper" not in why
    ]
    assert not body_flagged, f"unexpected non-helper flags: {body_flagged}"


def test_constants_of_resolves_shared_thresholds():
    # review r10: helpers_of dates only FUNCTIONS, so a bumped shared
    # threshold (JACCARD_MIN, a SCHEMAS entry) changed the plan without
    # staling evidence — constants_of must surface those references
    from rotate_window import constants_of

    reg = _registry()
    cases = {
        "q_dedup_groups": (
            "JACCARD_MIN",
            os.path.join("frauddetection_spark", "queries", "similarity.py"),
        ),
        "q_scan_csv": (
            "SCHEMAS",
            os.path.join("frauddetection_spark", "sources", "tables.py"),
        ),
    }
    for name, expected in cases.items():
        consts = constants_of(unwrap_query_fn(reg[name].fn))
        assert expected in consts, f"{name}: {expected} not in {consts}"
        # and nothing outside the package leaks in (F, Window, ...)
        assert all(
            rel.startswith("frauddetection_spark") for _, rel in consts
        )


def test_staleness_flags_consumers_on_constant_only_change(monkeypatch):
    # simulate a threshold bump: every function predates the green
    # artifacts, but JACCARD_MIN postdates them — the scan must flag
    # exactly the queries that reference that constant
    from rotate_window import constants_of

    jrel = os.path.join("frauddetection_spark", "queries", "similarity.py")

    def fake_const_time(repo, name, rel):
        if name == "JACCARD_MIN" and rel == jrel:
            return 10_000
        return 1

    monkeypatch.setattr(rotate_window, "_git_func_time",
                        lambda repo, funcname, rel: 1)
    monkeypatch.setattr(rotate_window, "_git_const_time", fake_const_time)
    monkeypatch.setattr(rotate_window, "_git_artifact_time",
                        lambda repo, path: 100)
    reg = _registry()
    expected = {
        name
        for name, spec in reg.items()
        if ("JACCARD_MIN", jrel) in constants_of(unwrap_query_fn(spec.fn))
    }
    assert "q_dedup_groups" in expected
    flagged = {
        name for name, _, why in rotate_window.staleness()
        if "constant" in why
    }
    assert flagged == expected


def test_check_window_fails_only_on_flags_outside_frozen_window(monkeypatch):
    # VERDICT r10 item 4: a plan rewrite that postdates evidence for a
    # query the frozen window will NOT re-run must fail the close-out
    # gate; a flag inside the window is fine (the driver re-greens it
    # this round by construction)
    from frauddetection_spark.plans.registry import _PRIORITY

    inside = _PRIORITY[0]

    monkeypatch.setattr(
        rotate_window, "staleness", lambda: [(inside, 4, "simulated")]
    )
    assert rotate_window.check_window() == []

    monkeypatch.setattr(
        rotate_window,
        "staleness",
        lambda: [(inside, 4, "simulated"), ("q_not_in_window", 5, "sim")],
    )
    assert rotate_window.check_window() == ["q_not_in_window"]
