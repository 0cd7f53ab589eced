"""Local DuckDB-oracle comparison harness.

Mirrors the driver's t2 check: for each declared query, run the Spark
DataFrame and the DuckDB twin on the same parquet tables and compare
row count + schema + an order-insensitive value hash. Used by
tests/test_oracle.py so a query is only *declared* once it's green here
(SURVEY.md §2 rule).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from frauddetection_spark.sources.tables import TABLE_NAMES

FLOAT_TOL = 1e-9


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v):
    """Canonicalize one value for order-insensitive comparison."""
    if v is None:
        return "\0null"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0nan"
        # queries round to 6dp already; this guards representation drift
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    # numpy containers/scalars: ndarray str() renders with whitespace
    # ("[ 45  8]") and differs between Arrow-enabled Spark toPandas and
    # DuckDB fetchdf — canonicalize through tolist()/item() instead.
    # (np.int64 etc. also route here; their python equivalents print
    # identically either way, so this is shape-normalizing only.)
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        w = v.tolist()
        if isinstance(w, (list, tuple)):
            return "[" + ",".join(_canon_cell(x) for x in w) + "]"
        return _canon_cell(w)
    return str(v)


def _canon_frame(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    rows = [
        "|".join(_canon_cell(row[c]) for c in cols)
        for row in pdf.to_dict("records")
    ]
    rows.sort()
    return rows


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    sp = spark_df.toPandas()
    # cache hygiene: a full-catalog comparison session runs 100+
    # queries back-to-back; tracked per-query persists (shingle/IVF/
    # rank frontiers) must not accumulate across them (ADVICE r3)
    from frauddetection_spark.operators.caching import release_caches

    release_caches()
    du = con.execute(sql).fetchdf()
    if sorted(sp.columns) != sorted(du.columns):
        return CompareResult(name, False, f"columns differ: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
    if len(sp) != len(du):
        return CompareResult(name, False, f"row count differs: spark={len(sp)} duckdb={len(du)}")
    a, b = _canon_frame(sp), _canon_frame(du)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return CompareResult(name, False, f"values differ; first diffs: {diffs}")
    return CompareResult(name, True, f"{len(sp)} rows match")
