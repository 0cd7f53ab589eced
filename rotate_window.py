#!/usr/bin/env python
"""Propose the next round's driver window from the evidence record.

The round driver verifies only the FIRST ``DRIVER_WINDOW`` entries of
``__spark_entry__.queries()`` per round, so window rotation is how
cumulative evidence stays fresh. The policy (established r09):

1. MANDATORY names first — queries with no green row yet, or whose
   plan changed after their latest green row (passed as CLI args;
   plan-change detection needs human/git judgment).
2. Remaining slots go to EVIDENCE FRESHNESS: the oracle-backed queries
   whose latest green CORRECTNESS row is oldest (ties broken
   alphabetically, so the proposal is deterministic).
3. Rows-only queries never take a slot unless named explicitly — the
   driver's rows>0 check is too weak to spend rotation slots on once
   each has been evidenced (the one r07 exemption cycled them all).

Usage:
    python rotate_window.py                 # freshness-only proposal
    python rotate_window.py q_foo q_bar     # mandatory names lead

Prints the ready-to-paste ``_PRIORITY`` tuple body plus an
evidence-age histogram. Purely driver-side: reads CORRECTNESS_r*.json
and the registry; starts no Spark session.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def latest_green(repo: str, upto: int | None = None) -> dict[str, int]:
    """query -> newest round with a green driver row (hash-green for
    oracle queries; err-free rows row for rows-only). ``upto`` caps
    the rounds considered — used by the pin test to reproduce a
    window from the evidence that existed when it was frozen, so the
    next round's artifact landing doesn't retroactively redden it."""
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", f)
        if not m:
            continue
        rnd = int(m.group(1))
        if upto is not None and rnd > upto:
            continue
        with open(f) as fh:
            rows = json.load(fh)
        for q, v in rows.items():
            green = v.get("hash_match") is True or (
                v.get("err") is None and v.get("hash_match") in (None, True)
            )
            if green:
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def propose(mandatory: list[str], upto: int | None = None) -> list[str]:
    from frauddetection_spark.plans.registry import DRIVER_WINDOW, load_all

    repo = os.path.dirname(os.path.abspath(__file__))
    reg = load_all()
    unknown = [n for n in mandatory if n not in reg]
    if unknown:
        raise SystemExit(f"unknown mandatory names: {unknown}")
    latest = latest_green(repo, upto=upto)
    oracle = {n for n, s in reg.items() if s.oracle is not None}

    window = list(dict.fromkeys(mandatory))  # dedupe, keep order
    # never-evidenced oracle queries are implicitly mandatory
    for n in sorted(oracle - set(latest) - set(window)):
        window.append(n)
    fill = sorted(
        (n for n in oracle if n not in window),
        key=lambda n: (latest[n], n),
    )
    window.extend(fill[: DRIVER_WINDOW - len(window)])
    if len(window) > DRIVER_WINDOW:
        raise SystemExit(
            f"{len(window)} names for a {DRIVER_WINDOW}-slot window — "
            "trim the mandatory list"
        )

    ages: dict[int, int] = {}
    for n in window:
        ages[latest.get(n, 0)] = ages.get(latest.get(n, 0), 0) + 1
    print("# evidence age of proposed window (green-round -> count):")
    for rnd in sorted(ages):
        label = f"r{rnd:02d}" if rnd else "never"
        print(f"#   {label}: {ages[rnd]}")
    print("# paste into plans/registry.py::_PRIORITY:")
    for n in window:
        print(f'    "{n}",')
    return window


if __name__ == "__main__":
    propose(sys.argv[1:])
