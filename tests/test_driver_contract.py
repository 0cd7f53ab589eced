"""Driver-contract regression: the round driver builds a PLAIN
SparkSession (no repo conf). Round 1 failed 34/50 queries because
``spark.sql.legacy.parquet.nanosAsLong`` lived only in the repo's own
session factory and events.parquet (INT64 TIMESTAMP(NANOS)) was
unreadable on a vanilla session.

This test runs in a SUBPROCESS — an in-process test would inherit the
suite's already-configured session via getOrCreate() and prove
nothing. It must never be weakened to use ``get_spark``.
"""

from __future__ import annotations

import json
import subprocess
import sys

SF_DIR = "/root/testdata/sf0.001"

_SCRIPT = f"""
import json
from pyspark.sql import SparkSession

# EXACTLY what the driver does: a plain builder, no repo configs.
spark = SparkSession.builder.master("local[4]").getOrCreate()

import __spark_entry__ as m

qs = m.queries()
# q_ts_parts touches events.parquet (the TIMESTAMP(NANOS) table).
rows = qs["q_ts_parts"](spark, {SF_DIR!r}).count()
entry_rows = m.entry(spark).count()

# streaming read path must also self-configure on a plain session
from frauddetection_spark.streaming.windows import stream_events
stream_df = stream_events(spark, {SF_DIR!r})
assert stream_df.isStreaming

print(json.dumps({{"ts_parts_rows": rows, "entry_rows": entry_rows}}))
spark.stop()
"""


def test_plain_session_reads_events():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert proc.returncode == 0, f"plain-session run failed:\n{proc.stderr[-4000:]}"
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["ts_parts_rows"] > 0
    assert out["entry_rows"] >= 0


def test_every_declared_query_named_in_survey():
    """SURVEY.md §2 is THE CONTRACT the judge reconciles line by line:
    every name in queries() must appear somewhere in SURVEY.md (primary
    rows or the §2.9 name-reconciliation table), or coverage claims and
    the registry drift apart silently.

    Matching is EXACT-TOKEN (VERDICT r06 item 3): substring matching let
    q_ann_ivf / q_simhash / q_funnel pass for three rounds because they
    are substrings of q_ann_ivf_sampled / q_simhash_pairs /
    q_funnel_paths."""
    import os
    import re

    from frauddetection_spark.plans.registry import load_all

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SURVEY.md")) as fh:
        survey_names = set(re.findall(r"q_\w+", fh.read()))
    missing = [n for n in load_all() if n not in survey_names]
    assert missing == [], (
        "declared queries not named in SURVEY.md — add them to the §2 "
        f"row they extend or to §2.9: {missing}"
    )
