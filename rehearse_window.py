#!/usr/bin/env python
"""Driver-window rehearsal: re-run the exact check the round driver runs.

The per-round driver takes the FIRST ``DRIVER_WINDOW`` entries of
``__spark_entry__.queries()``, runs each on a *vanilla* SparkSession
(plain builder at host parallelism — ``SPARK_GRAFT_CPUS`` or
``os.cpu_count()`` — none of the repo's tuned configs) at sf0.01, and
compares against the DuckDB twin (row count + schema + order-insensitive
value hash; since round 9 ``compare`` also runs the vendored
driver-canonicalizer leg, so every rehearsal exercises the driver's
exact pandas code path). Freezing a window without rehearsing it
on a vanilla session risks shipping a query that only passes under the
test suite's configs — this script makes the rehearsal reproducible
(it was ad-hoc in rounds 6-7; VERDICT r06 item 7 asked for it before
every freeze).

Usage:
    python rehearse_window.py            # first DRIVER_WINDOW entries
    python rehearse_window.py --all      # all declared queries
    python rehearse_window.py q_item_cf q_tpch_q2   # named subset
    python rehearse_window.py --all --hostile       # hostile-config cert

``--hostile`` swaps the vanilla driver session for the adversarial
partition-invariance config the README's correctness claim is
certified under (rounds 6/9/11 ran this ad-hoc; VERDICT r12 item 2
asked for the full-catalog re-cert to be a standing reproducible
artifact): local[5] (odd, undersubscribed), 7 shuffle partitions
(prime, tiny — surfaces any per-partition nondeterminism a 32/200
layout hides), ANSI mode off (the lenient coercion path), Arrow
DISABLED for pandas UDF exchange (the slow serializer path — results
must not depend on the Arrow batch boundary). Any query whose result
depends on partition count, evaluation order, or the exchange format
hash-mismatches here.

Prints one line per query and a final JSON summary; exit code 1 on any
mismatch/error.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="explicit query names")
    ap.add_argument("--all", action="store_true", help="run all declared queries")
    ap.add_argument(
        "--hostile",
        action="store_true",
        help="certify under the adversarial config: local[5], 7 shuffle "
        "partitions, ANSI off, Arrow off (partition-invariance gate)",
    )
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"),
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from frauddetection_spark.oracle import compare, duckdb_connection
    from frauddetection_spark.plans.registry import DRIVER_WINDOW

    # Vanilla driver-style session: plain builder, no repo configs.
    # Parallelism follows the host (ADVICE r08): a hardcoded local[32]
    # oversubscribes smaller hosts, and getOrCreate would silently
    # REUSE any tuned session already live in this process — which
    # defeats the vanilla-session purpose, so refuse instead.
    # explicit raise, not assert: must survive python -O (review r09)
    if SparkSession.getActiveSession() is not None:
        raise SystemExit(
            "a SparkSession is already active in this process — the "
            "rehearsal must build its own vanilla session; run this "
            "script standalone"
        )
    try:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", ""))
    except ValueError:
        cpus = os.cpu_count() or 4
    cpus = max(1, cpus)
    if args.hostile:
        spark = (
            SparkSession.builder.master("local[5]")
            .appName("rehearse-window-hostile")
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.sql.ansi.enabled", "false")
            .config("spark.sql.execution.arrow.pyspark.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("rehearse-window")
            .getOrCreate()
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.names:
        names = args.names
    elif args.all:
        names = list(queries)
    else:
        names = list(queries)[:DRIVER_WINDOW]

    from frauddetection_spark.operators.caching import release_caches

    con = duckdb_connection(args.sf_dir)
    t0 = time.time()
    failures: dict[str, str] = {}
    for i, name in enumerate(names, 1):
        qt = time.time()
        try:
            df = queries[name](spark, args.sf_dir)
            if name in oracles:
                # compare() drains tracked caches internally
                res = compare(name, df, con, oracles[name])
                ok, detail = res.ok, res.detail
            else:
                n = df.count()
                ok, detail = n > 0, f"rows_only rows={n}"
                release_caches()
        except Exception as e:  # noqa: BLE001 — rehearsal must report, not die
            ok, detail = False, f"{type(e).__name__}: {e}"
            release_caches()
        status = "ok" if ok else "FAIL"
        if not ok:
            failures[name] = detail
        print(f"[{i:>3}/{len(names)}] {name:<28} {status:<4} {time.time()-qt:5.1f}s {detail if not ok else ''}")
        sys.stdout.flush()
    summary = {
        "checked": len(names),
        "failed": failures,
        "elapsed_sec": round(time.time() - t0, 1),
        "sf_dir": args.sf_dir,
    }
    print(json.dumps(summary))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
