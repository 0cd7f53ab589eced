"""Unit tests for bench.py's calib-relative regression gate (VERDICT
r06 item 2): BENCH_r06 recorded three >2x "regressions" that were host
drift — its calib_sec was 0.605s vs ~0.3s implied for the round-5
session — and the committed artifact asserted plan regressions that the
same round's scale audit refuted. The gate must (a) divide out the
host factor calib_now/calib_then when both rounds carry calib_sec and
(b) fall back to raw seconds against pre-calibration artifacts.

Pure-python: no Spark session, no fixtures from conftest needed.
"""

from __future__ import annotations

import json
import os
import sys

# repo root from __file__ (ADVICE r07): no hardcoded checkout path
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bench import regression_report  # noqa: E402


def _bench_file(tmp_path, name, queries, calib=None, calib_scan=None, sf=None):
    payload = {"queries": queries}
    if calib is not None:
        payload["calib_sec"] = calib
    if calib_scan is not None:
        payload["calib_scan_sec"] = calib_scan
    if sf is not None:
        payload["sf"] = sf
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


def test_host_drift_not_flagged_when_calibrated(tmp_path):
    # 2.2x raw growth on a host measured 2.2x slower -> NOT a regression
    prior = _bench_file(
        tmp_path, "BENCH_r06.json", {"q_a": 1.0, "q_b": 0.5}, calib=0.3
    )
    lines = regression_report(
        {"q_a": 2.2, "q_b": 1.1}, calib=0.66, bench_files=[prior]
    )
    assert any("host factor" in ln and "2.20x" in ln for ln in lines)
    assert not any("REGRESSION" in ln for ln in lines)


def test_true_regression_survives_calibration(tmp_path):
    # 5x raw growth on a host only 1.1x slower -> still flagged
    prior = _bench_file(
        tmp_path, "BENCH_r06.json", {"q_a": 1.0}, calib=0.5
    )
    lines = regression_report({"q_a": 5.0}, calib=0.55, bench_files=[prior])
    assert any(ln.startswith("# REGRESSION q_a") for ln in lines)


def test_raw_fallback_for_uncalibrated_prior(tmp_path):
    # prior round has no calib_sec (r01-r05 artifacts): raw >2x flags
    prior = _bench_file(tmp_path, "BENCH_r05.json", {"q_a": 1.0})
    lines = regression_report({"q_a": 2.5}, calib=0.5, bench_files=[prior])
    assert any(ln.startswith("# REGRESSION q_a") for ln in lines)
    # no standalone calib line — the gate ran on raw seconds
    assert not any(ln.startswith("# host factor") for ln in lines)


def test_per_query_gate_only_against_newest_round(tmp_path):
    # q_a regressed vs r05 but was already slow in r06 (the newest
    # prior): only the newest round gates, so no flag — while the
    # overlap subtotal line still reports BOTH rounds
    r05 = _bench_file(tmp_path, "BENCH_r05.json", {"q_a": 0.5}, calib=0.5)
    r06 = _bench_file(tmp_path, "BENCH_r06.json", {"q_a": 2.0}, calib=0.5)
    lines = regression_report(
        {"q_a": 2.1}, calib=0.5, bench_files=[r05, r06]
    )
    assert sum("overlap vs" in ln for ln in lines) == 2
    assert not any("REGRESSION" in ln for ln in lines)


def test_cross_sf_rounds_not_compared(tmp_path):
    # r09: a sf0.001 smoke run must not gate against sf0.1 artifacts —
    # fixed overheads dominate small sf and produce phantom regressions
    p = tmp_path / "BENCH_r08.json"
    p.write_text(
        json.dumps({"queries": {"q_a": 0.2}, "calib_sec": 0.5, "sf": 0.1})
    )
    lines = regression_report(
        {"q_a": 0.5}, calib=0.5, bench_files=[str(p)], sf=0.001
    )
    assert lines == []
    # same sf → still gates
    lines = regression_report(
        {"q_a": 0.5}, calib=0.5, bench_files=[str(p)], sf=0.1
    )
    assert any("REGRESSION" in ln for ln in lines)
    # prior without sf (pre-guard artifact) → old behavior
    p2 = tmp_path / "BENCH_r05.json"
    p2.write_text(json.dumps({"queries": {"q_a": 0.2}}))
    lines = regression_report(
        {"q_a": 0.5}, calib=0.5, bench_files=[str(p2)], sf=0.001
    )
    assert any("REGRESSION" in ln for ln in lines)


def test_gate_runs_against_newest_same_sf_prior(tmp_path):
    # review r09: if the NEWEST artifact is a different-sf run, the
    # per-query gate must fall back to the newest SAME-SF prior, not
    # silently disappear
    same = _bench_file(tmp_path, "BENCH_r08.json", {"q_a": 0.2}, calib=0.5)
    with open(same) as f:
        payload = json.load(f)
    payload["sf"] = 0.1
    with open(same, "w") as f:
        json.dump(payload, f)
    other = tmp_path / "BENCH_r09.json"
    other.write_text(
        json.dumps({"queries": {"q_a": 0.1}, "calib_sec": 0.5, "sf": 0.001})
    )
    lines = regression_report(
        {"q_a": 0.5}, calib=0.5, bench_files=[same, str(other)], sf=0.1
    )
    assert any("REGRESSION q_a" in ln and "BENCH_r08" in ln for ln in lines)


def test_driver_wrapped_artifact_unwraps(tmp_path):
    # the round driver wraps our JSON line under "parsed"
    p = tmp_path / "BENCH_r06.json"
    p.write_text(
        json.dumps(
            {"parsed": {"queries": {"q_a": 1.0}, "calib_sec": 0.5}}
        )
    )
    lines = regression_report({"q_a": 5.0}, calib=0.5, bench_files=[str(p)])
    assert any(ln.startswith("# REGRESSION q_a") for ln in lines)


def test_io_drift_not_flagged_when_scan_probe_carries_it(tmp_path):
    # VERDICT r09 item 2 (the round-9 phantom class): the whole catalog
    # ran ~1.2x slower while CPU calib read FASTER — drift lived in the
    # I/O/scheduler dimension. With calib_scan_sec in both rounds the
    # host factor is max(cpu, scan): 2.2x raw growth with a flat CPU
    # probe but a 2.2x-slower scan probe -> NOT a regression.
    prior = _bench_file(
        tmp_path, "BENCH_r09.json", {"q_a": 1.0, "q_b": 0.5},
        calib=0.5, calib_scan=0.2,
    )
    lines = regression_report(
        {"q_a": 2.2, "q_b": 1.1}, calib=0.5,
        bench_files=[prior], calib_scan=0.44,
    )
    assert any(
        "host factor" in ln and "scan 2.20x" in ln for ln in lines
    )
    assert not any("REGRESSION" in ln for ln in lines)


def test_true_regression_fires_with_both_probes_flat(tmp_path):
    # the acceptance case for the max(cpu, scan) gate: both probes flat
    # -> a true >2x plan regression still fires
    prior = _bench_file(
        tmp_path, "BENCH_r09.json", {"q_a": 1.0},
        calib=0.5, calib_scan=0.2,
    )
    lines = regression_report(
        {"q_a": 5.0}, calib=0.5, bench_files=[prior], calib_scan=0.2
    )
    assert any(ln.startswith("# REGRESSION q_a") for ln in lines)


def test_scan_probe_missing_in_prior_falls_back_to_cpu_only(tmp_path):
    # r01-r08 artifacts carry no calib_scan_sec: scan factor defaults
    # to 1.0 and the gate behaves exactly as the CPU-only gate did
    prior = _bench_file(
        tmp_path, "BENCH_r08.json", {"q_a": 1.0}, calib=0.5
    )
    lines = regression_report(
        {"q_a": 2.5}, calib=0.5, bench_files=[prior], calib_scan=0.9
    )
    assert any(ln.startswith("# REGRESSION q_a") for ln in lines)


def test_unknown_sf_skips_gate_against_sf_declared_prior(tmp_path):
    # ADVICE r09: sf=None used to disable the same-sf eligibility
    # filter entirely, so an off-sf nonstandard run gated raw against
    # priors of any scale factor. New behavior: keep the overlap
    # subtotal, skip the per-query gate with an explicit annotation.
    prior = _bench_file(
        tmp_path, "BENCH_r09.json", {"q_a": 0.2}, calib=0.5, sf=0.1
    )
    lines = regression_report(
        {"q_a": 0.5}, calib=0.5, bench_files=[prior], sf=None
    )
    assert any("overlap vs" in ln for ln in lines)
    assert any("gate skipped" in ln and "sf unknown" in ln for ln in lines)
    assert not any("REGRESSION" in ln for ln in lines)
    # both sides sf-less (pre-guard artifacts): raw gate still runs —
    # there is no recorded sf to contradict
    prior2 = _bench_file(
        tmp_path, "BENCH_r05.json", {"q_a": 0.2}, calib=0.5
    )
    lines = regression_report(
        {"q_a": 0.5}, calib=0.5, bench_files=[prior2], sf=None
    )
    assert any("REGRESSION q_a" in ln for ln in lines)


def test_flags_out_carries_adjudication_context(tmp_path):
    # bench's in-artifact self-adjudication needs (prior_s, host,
    # prior_file) per flag to re-apply the SAME gate standalone —
    # flags_out must mirror every REGRESSION line exactly
    prior = _bench_file(
        tmp_path, "BENCH_r09.json", {"q_a": 1.0, "q_b": 1.0},
        calib=0.5, calib_scan=0.2, sf=0.1,
    )
    flags = []
    lines = regression_report(
        {"q_a": 5.0, "q_b": 1.5}, calib=0.55,
        bench_files=[prior], sf=0.1, calib_scan=0.2, flags_out=flags,
    )
    assert sum("REGRESSION" in ln for ln in lines) == 1
    assert len(flags) == 1
    fl = flags[0]
    assert fl["name"] == "q_a"
    assert fl["now_s"] == 5.0
    assert fl["prior_s"] == 1.0
    assert fl["prior_file"] == prior
    # host = max(cpu 1.1, scan 1.0)
    assert abs(fl["host"] - 1.1) < 1e-6
    # and the param stays optional — identical lines without it
    assert regression_report(
        {"q_a": 5.0, "q_b": 1.5}, calib=0.55,
        bench_files=[prior], sf=0.1, calib_scan=0.2,
    ) == lines


def test_sentinel_sf_prior_normalized_to_unknown(tmp_path):
    # review r10: main() writes sf=-1.0 for an unparseable sf dir, so a
    # prior from the same non-sf-named dir must read as sf-UNKNOWN, not
    # as a declared scale factor — two consecutive runs from that dir
    # still gate against each other raw (and no misleading
    # "prior recorded sf=-1.0" skip line appears)
    prior = _bench_file(
        tmp_path, "BENCH_r08.json", {"q_a": 0.1}, calib=0.5, sf=-1.0
    )
    lines = regression_report(
        {"q_a": 0.5}, calib=0.5, bench_files=[prior], sf=None
    )
    assert any("REGRESSION q_a" in ln for ln in lines)
    assert not any("gate skipped" in ln for ln in lines)


def test_host_factor_line_readable_when_scan_probe_missing(tmp_path):
    # review r10: with calib_scan=None this run, the annotation must
    # not render "calib_scan Nones vs ..." — it says the probe was
    # unavailable and the gate is CPU-only
    prior = _bench_file(
        tmp_path, "BENCH_r09.json", {"q_a": 0.2},
        calib=0.5, calib_scan=0.25, sf=0.1,
    )
    lines = regression_report(
        {"q_a": 0.3}, calib=0.9, bench_files=[prior], sf=0.1,
        calib_scan=None,
    )
    host_lines = [ln for ln in lines if "host factor" in ln]
    assert host_lines and "Nones" not in host_lines[0]
    assert "scan probe unavailable" in host_lines[0]


def test_adjusted_out_carries_per_query_host_ratios(tmp_path):
    # VERDICT r10 item 3: the artifact must be readable standalone —
    # per-query now/(host*prior) ratios vs the gate round, so a
    # 2.2x-raw query on a 2x-slower host reads as the honest 1.1x
    # without cross-referencing an adjudication file
    prior = _bench_file(
        tmp_path, "BENCH_r10.json", {"q_a": 1.0, "q_b": 0.5},
        calib=0.3, calib_scan=0.2, sf=0.1,
    )
    adjusted = {}
    lines = regression_report(
        {"q_a": 2.2, "q_b": 0.5}, calib=0.6,
        bench_files=[prior], sf=0.1, calib_scan=0.4,
        adjusted_out=adjusted,
    )
    assert adjusted["prior_file"] == "BENCH_r10.json"
    assert abs(adjusted["host_factor"] - 2.0) < 1e-6
    assert abs(adjusted["ratios"]["q_a"] - 1.1) < 1e-6
    assert abs(adjusted["ratios"]["q_b"] - 0.5) < 1e-6
    # gate behavior unchanged: same lines with or without the param
    assert regression_report(
        {"q_a": 2.2, "q_b": 0.5}, calib=0.6,
        bench_files=[prior], sf=0.1, calib_scan=0.4,
    ) == lines
    assert not any("REGRESSION" in ln for ln in lines)


def test_adjusted_out_empty_when_gate_skipped(tmp_path):
    # unknown current sf vs an sf-declared prior skips the per-query
    # gate — the adjusted dict must stay empty rather than carry raw
    # cross-sf ratios dressed up as host-adjusted
    prior = _bench_file(
        tmp_path, "BENCH_r10.json", {"q_a": 1.0}, calib=0.3, sf=0.1
    )
    adjusted = {}
    regression_report(
        {"q_a": 2.2}, calib=0.6, bench_files=[prior], sf=None,
        adjusted_out=adjusted,
    )
    assert adjusted == {}


def test_adjusted_out_ratios_only_against_newest_same_sf_prior(tmp_path):
    # the ratios mirror the gate round exactly: newest SAME-SF prior,
    # uncalibrated fallback means host 1.0 and raw ratios
    r09 = _bench_file(tmp_path, "BENCH_r09.json", {"q_a": 0.5}, sf=0.1)
    r10 = _bench_file(tmp_path, "BENCH_r10.json", {"q_a": 2.0}, sf=0.1)
    adjusted = {}
    regression_report(
        {"q_a": 1.0}, calib=0.5, bench_files=[r09, r10], sf=0.1,
        adjusted_out=adjusted,
    )
    assert adjusted["prior_file"] == "BENCH_r10.json"
    assert adjusted["host_factor"] == 1.0
    assert abs(adjusted["ratios"]["q_a"] - 0.5) < 1e-6


# ---- round 12: elevated band, recheck cap, truncation-proofing ----

from bench import (  # noqa: E402
    _prior_from_tail,
    order_payload,
    select_rechecks,
)


def test_elevated_band_flagged_between_1p5_and_2x(tmp_path):
    # VERDICT r11 item 2: BENCH_r11 left 1.5-2x host-adjusted ratios
    # (q_item_cf 1.76, q_sparse_cosine 1.87, ...) with no in-artifact
    # adjudication because only >2x triggered a flag
    prior = _bench_file(tmp_path, "BENCH_r11.json", {"q_a": 1.0}, calib=0.5)
    flags: list[dict] = []
    lines = regression_report(
        {"q_a": 1.7}, calib=0.5, bench_files=[prior], flags_out=flags
    )
    assert any(ln.startswith("# ELEVATED q_a") for ln in lines)
    assert not any("REGRESSION" in ln for ln in lines)
    assert flags and flags[0]["band"] == "elevated"


def test_regression_band_keeps_its_label(tmp_path):
    prior = _bench_file(tmp_path, "BENCH_r11.json", {"q_a": 1.0}, calib=0.5)
    flags: list[dict] = []
    lines = regression_report(
        {"q_a": 2.5}, calib=0.5, bench_files=[prior], flags_out=flags
    )
    assert any(ln.startswith("# REGRESSION q_a") for ln in lines)
    assert flags[0]["band"] == "regression"


def test_below_1p5_not_flagged(tmp_path):
    prior = _bench_file(tmp_path, "BENCH_r11.json", {"q_a": 1.0}, calib=0.5)
    lines = regression_report({"q_a": 1.4}, calib=0.5, bench_files=[prior])
    assert not any("ELEVATED" in ln or "REGRESSION" in ln for ln in lines)


def test_select_rechecks_caps_at_worst_n():
    flags = [
        {"name": f"q_{i}", "now_s": float(i), "prior_s": 1.0, "host": 1.0}
        for i in range(1, 13)
    ]
    check, capped = select_rechecks(flags, cap=8)
    # worst ratios (12x .. 5x) get the recheck, the mildest 4 are capped
    assert [f["name"] for f in check] == [f"q_{i}" for i in range(12, 4, -1)]
    assert {f["name"] for f in capped} == {"q_1", "q_2", "q_3", "q_4"}


def test_select_rechecks_zero_prior_ranks_first():
    flags = [
        {"name": "q_small", "now_s": 3.0, "prior_s": 1.0, "host": 1.0},
        {"name": "q_zero", "now_s": 0.1, "prior_s": 0.0, "host": 1.0},
    ]
    check, capped = select_rechecks(flags, cap=1)
    assert check[0]["name"] == "q_zero" and capped[0]["name"] == "q_small"


def _emitted_line(queries, sf=0.1, calib=0.5, calib_scan=0.25,
                  host_adjusted=None, regressions=None):
    core = {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "calib_sec": calib,
        "calib_scan_sec": calib_scan,
    }
    optional = {}
    if host_adjusted:
        optional["host_adjusted"] = host_adjusted
    if regressions:
        optional["regressions"] = regressions
    return json.dumps(order_payload(core, optional))


def test_tail_slice_of_emitted_line_recovers_full_queries():
    # VERDICT r11 item 4: the driver keeps only the last 2000 chars of
    # bench output; the emitted key order must keep the compact gate
    # record (queries/sf/calib) parseable from any tail that big
    queries = {f"q_very_long_query_name_{i:03d}": round(i * 0.123, 3)
               for i in range(40)}
    big_ratios = {n: 1.11 for n in queries}
    big_rechecks = {
        n: {"sweep_s": 9.9, "prior_s": 1.0, "prior_file": "BENCH_r11.json",
            "host": 1.0, "band": "regression", "verdict": "refuted",
            "recheck_s": 1.0}
        for n in list(queries)[:8]
    }
    line = _emitted_line(
        queries,
        host_adjusted={"prior_file": "BENCH_r11.json", "host_factor": 1.0,
                       "ratios": big_ratios},
        regressions=big_rechecks,
    )
    assert len(line) > 2000  # the scenario under test: an oversized line
    recovered = _prior_from_tail(line[-2000:])
    assert recovered is not None
    assert recovered["queries"] == queries
    assert recovered["sf"] == 0.1
    assert recovered["calib_sec"] == 0.5
    assert recovered["calib_scan_sec"] == 0.25


def test_untruncated_emitted_line_still_plain_json():
    line = _emitted_line({"q_a": 1.0})
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["queries"] == {"q_a": 1.0}


def test_null_parsed_prior_recovered_from_tail(tmp_path):
    # the driver wraps an oversized line as {"parsed": null, "tail": ...}
    queries = {"q_a": 1.0, "q_b": 2.0}
    line = _emitted_line(queries, sf=0.1)
    p = tmp_path / "BENCH_r11.json"
    p.write_text(json.dumps(
        {"n": 11, "rc": 0, "sf": 0.1, "parsed": None, "tail": line[-2000:]}
    ))
    flags: list[dict] = []
    lines = regression_report(
        {"q_a": 5.0, "q_b": 2.0}, calib=0.5, bench_files=[str(p)],
        sf=0.1, flags_out=flags,
    )
    assert any("recovered 2 query timings" in ln for ln in lines)
    assert any(ln.startswith("# REGRESSION q_a") for ln in lines)
    assert not any("q_b" in ln and "REGRESSION" in ln for ln in lines)


def test_null_parsed_prior_with_amputated_tail_skipped(tmp_path):
    # BENCH_r11's actual shape: the queries object head was eaten, so
    # nothing recoverable — the round is excluded WITH a note, never a
    # crash (the r12 gate died on None.get here)
    p = tmp_path / "BENCH_r11.json"
    p.write_text(json.dumps({
        "n": 11, "rc": 0, "sf": 0.1, "parsed": None,
        "tail": 'e": 2.567, "q_tpch_q9": 0.717}, "sf": 0.1, "calib_sec": 0.494}',
    }))
    lines = regression_report(
        {"q_a": 5.0}, calib=0.5, bench_files=[str(p)], sf=0.1
    )
    assert any("unusable: driver-truncated" in ln for ln in lines)
    assert not any("REGRESSION" in ln for ln in lines)


def test_audit_input_bounds_well_formed_and_skip_decision(tmp_path):
    # The scale sweep's beyond-docstring-bound skip (round 13): a
    # by-design quadratic whose own contract names a max corpus size
    # is skipped IN-ARTIFACT once the hi side exceeds it, instead of
    # burning hours re-confirming the definition or — worse —
    # silently capping coverage. Pin: (a) every bound entry is also
    # in the by-design list (a bound on a contested plan would hide a
    # real flag), (b) the row counter reads parquet footers, (c) the
    # decision flips exactly at the bound.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bench import (
        AUDIT_INPUT_BOUNDS,
        AUDIT_QUADRATIC_BY_DESIGN,
        _parquet_rows,
    )

    for name, (table, max_rows, why) in AUDIT_INPUT_BOUNDS.items():
        assert name in AUDIT_QUADRATIC_BY_DESIGN, (
            f"{name}: input bounds may only cap BY-DESIGN quadratics; "
            "a bound on a contested plan would hide a real flag"
        )
        assert isinstance(max_rows, int) and max_rows > 0
        assert len(why) > 40, "the skip reason must be substantive"

    p = tmp_path / "embeddings.parquet"
    pq.write_table(pa.table({"vec_id": list(range(7))}), p)
    assert _parquet_rows(str(p)) == 7
    table, max_rows, _ = AUDIT_INPUT_BOUNDS["q_knn_cosine"]
    assert table == "embeddings"
    # sf1 (20k vectors) is under the bound — it was measured there;
    # sf10 (200k) is over it
    assert 20_000 <= max_rows < 200_000


def test_audit_strategy_boundary_wiring():
    # Cost-model-boundary adjudication (round 13): entries must name a
    # real registered query, a non-empty env pin whose key the query
    # module actually reads (a renamed env var would silently turn the
    # adjudication into a no-op re-measurement of the SAME auto plan),
    # and a substantive note.
    import glob

    from bench import AUDIT_STRATEGY_BOUNDARY

    src = "\n".join(
        open(p).read()
        for p in glob.glob(
            os.path.join(_REPO, "frauddetection_spark", "**", "*.py"),
            recursive=True,
        )
    )
    for name, (env, note) in AUDIT_STRATEGY_BOUNDARY.items():
        assert env and all(
            isinstance(k, str) and isinstance(v, str) for k, v in env.items()
        )
        assert len(note) > 40
        for key in env:
            assert key in src, (
                f"{name}: env pin {key} is read nowhere in the package"
            )


def test_warmup_block_cannot_precompute(tmp_path):
    """VERDICT r13 item 10: the pre-timing warmup must never become
    precomputation. Structural pin over bench.main()'s source, from
    session creation to the `for name in HEADLINE` timing loop:

    - the ONLY declared query invoked pre-timing is q_scan_parquet
      (the documented footer/page-cache warm — both as a registry
      subscript and as a string literal, so a warmup that spells a
      query name any other way still fails);
    - nothing pre-timing persists/caches/checkpoints (a warmed cache
      surviving into the timed region would be result precomputation).
    """
    import ast
    import inspect
    import textwrap

    import bench

    tree = ast.parse(textwrap.dedent(inspect.getsource(bench.main)))
    fn = tree.body[0]
    pre: list[ast.stmt] = []
    for stmt in fn.body:
        if (
            isinstance(stmt, ast.For)
            and isinstance(stmt.iter, ast.Name)
            and stmt.iter.id == "HEADLINE"
        ):
            break
        pre.append(stmt)
    else:
        raise AssertionError("bench.main(): HEADLINE timing loop not found")
    region = ast.Module(body=pre, type_ignores=[])

    query_literals = set()
    for node in ast.walk(region):
        if (
            isinstance(node, ast.Constant)
            and isinstance(node.value, str)
            and node.value.startswith("q_")
        ):
            query_literals.add(node.value)
        if isinstance(node, ast.Attribute) and node.attr in {
            "persist",
            "cache",
            "checkpoint",
            "localCheckpoint",
        }:
            raise AssertionError(
                f"pre-timing warmup calls .{node.attr}() — warmed state "
                "must not survive into the timed region"
            )
    assert query_literals <= {"q_scan_parquet"}, (
        "pre-timing region invokes declared queries beyond the "
        f"documented scan warm: {sorted(query_literals)}"
    )
