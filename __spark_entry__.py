"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`frauddetection_spark.plans.registry` — the query
catalog is the single source of truth; every declared name is green
against the local DuckDB harness (tests/test_oracle.py) before it
appears here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from frauddetection_spark.plans.registry import load_all

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's entire per-user/per-week behavioral
    ETL (data_process.py:114-158) as one declarative pass
    (q_behavioral_features) on sf0.001."""
    registry = load_all()
    return registry["q_behavioral_features"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; rows-only queries (spec.oracle is None) are omitted."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
