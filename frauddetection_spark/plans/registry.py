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
    "frauddetection_spark.queries.llm_pipeline",
)


def register(name: str, oracle: str | None, survey: str = "", doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey=survey, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# Explicit presentation order. The round driver evaluates only the FIRST
# 50 entries of ``queries()``. Rounds 1+2 accumulated driver-green rows
# for 52 of the 97 oracle-backed queries (CORRECTNESS_r01/r02.json);
# round 3 rotates the window to the 45 oracle queries that have NEVER
# been driver-green (r1's nanos-ERR casualties + every round-2
# addition), plus the 3 queries ADDED this round (sampled-seeding IVF,
# batch sessionization, bucketed interval join) and 2 already-green
# sentinels whose implementation changed this round (q_metric_auc's
# distributed rank, q_ann_ivf's seeding refactor). Cumulative driver
# evidence (past green ∪ this window) covers all 100 oracle queries —
# pinned by tests/test_plans.py::test_driver_window_completes_evidence.
_PRIORITY: tuple[str, ...] = (
    # --- never-driver-green: relational / scan surface ---
    "q_scan_partitioned", "q_scan_jsonl", "q_unpivot", "q_pivot",
    "q_intersect", "q_profile_events", "q_salted_agg",
    "q_histogram_norm", "q_lag_gap", "q_class_rates",
    # --- never-driver-green: CDC / temporal ---
    "q_latest_state", "q_scd2_intervals", "q_trailing_range",
    "q_asof_attribution", "q_funnel",
    # --- never-driver-green: rank / distribution features ---
    "q_user_deciles", "q_winsorize",
    # --- never-driver-green: graph (J4 — buildLSN — first) ---
    "q_join_common_neighbor", "q_graph_degrees", "q_neighbor_avg_degree",
    "q_graph_aggregate_weighted", "q_clustering_coeff",
    "q_connected_components", "q_pagerank",
    # --- never-driver-green: metrics (M5) ---
    "q_metric_prf", "q_metric_ap", "q_metric_calibration", "q_model_score",
    # --- never-driver-green: text (E4-E5) ---
    "q_lang_id", "q_token_regex", "q_fingerprint", "q_ngrams",
    # --- never-driver-green: similarity / embeddings (E2-E3) ---
    "q_simhash", "q_embed_neardup", "q_embed_quantize",
    # --- never-driver-green: LLM corpus pipeline ---
    "q_doc_chunks", "q_pack_sequences", "q_decontaminate",
    "q_quality_rules", "q_domain_mix", "q_feature_hash",
    "q_doc_stats_mapinpandas", "q_binary_meta",
    # --- never-driver-green: streaming batch-twins (E7) ---
    "q_tumbling_counts", "q_sliding_counts",
    # --- new this round (oracle-backed, need first driver evidence) ---
    "q_ann_ivf_sampled",  # 100-TB codebook: sampled Lloyd training
    "q_sessionize",       # batch gaps-and-islands sessionization
    "q_interval_join",    # bucketed point-in-interval range join
    # --- sentinels (driver-green in r2; re-proven each round because
    # their implementation changed this round) ---
    "q_metric_auc",      # distributed two-phase rank
    "q_ann_ivf",         # ivf_topk seeding refactor (low_id unchanged)
)

DRIVER_WINDOW = 50

# Oracle-backed queries added AFTER this round's 50-slot window was
# frozen (every slot is taken by a query that still needs its first
# driver-green row). They are locally oracle-green (tests/test_oracle.py)
# and MUST be promoted into _PRIORITY at the next rotation —
# tests/test_plans.py::test_driver_window_completes_evidence enforces
# that nothing else ships outside the cumulative-evidence invariant.
QUEUED_NEXT_WINDOW: tuple[str, ...] = (
    "q_scan_orc",
    "q_pii_redact",
    "q_join_salted",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the catalog,
    reordered so `_PRIORITY` comes first (driver-window placement)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
