"""Query catalog: the single source of truth behind ``__spark_entry__.py``.

Each :class:`QuerySpec` binds a declared query name (SURVEY.md §2's
contract column) to

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation,
- ``oracle`` — the DuckDB-SQL twin (None → driver's weaker rows-only
  check, for genuinely non-SQL-expressible ops),
- ``survey`` — the §2 row id(s) this query covers, for judge parity.

Authoring rules (SURVEY.md §5):
- alias every computed column identically in both twins;
- round floats (``round(x, 6)``) in both to dodge summation-order drift;
- ``sort_array`` any collected arrays;
- never use ``first()``/nondeterministic dedup in an oracle query.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    survey: str = ""
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Modules that populate the registry on import.
_QUERY_MODULES = (
    "frauddetection_spark.queries.relational",
    "frauddetection_spark.queries.features",
    "frauddetection_spark.queries.graph",
    "frauddetection_spark.queries.sampling",
    "frauddetection_spark.queries.metrics",
    "frauddetection_spark.queries.text",
    "frauddetection_spark.queries.similarity",
    "frauddetection_spark.queries.streaming_twins",
    "frauddetection_spark.queries.python_surface",
)


def register(name: str, oracle: str | None, survey: str = "", doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey=survey, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the catalog."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return REGISTRY
