"""Arrow-vectorized Python surface (SURVEY.md §2.8 E8).

UDFs are the slow path (SNIPPETS.md §[1]): every function here exists
either because the logic genuinely needs numpy/pandas, or to expose
the engine's full UDF API surface with tested semantics. Rules:

- scalar / grouped-agg `pandas_udf` and `applyInPandas` only — never
  row-at-a-time `udf` in an operator path (10-100× slower; one Python
  round-trip per ROW instead of per Arrow batch);
- exact-int accumulation inside the Python side too (cents trick,
  queries/_util.py), so pandas results stay bit-comparable with the
  JVM and DuckDB versions of the same formula;
- every UDF has a built-in-expression twin where one exists — the UDF
  version must match it (tests/test_pandas_udfs.py), which keeps the
  Python path honest and demonstrates the 'prefer built-ins' rule.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


# --- scalar pandas_udf ------------------------------------------------------


@F.pandas_udf(LongType())
def token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over an Arrow batch.
    Built-in twin: size(split(text, '\\s+'))."""
    return text.str.split().str.len().astype("int64")


@F.pandas_udf(DoubleType())
def log1p_value(v: pd.Series) -> pd.Series:
    """numpy elementwise math on an Arrow batch (twin: ln(1+v))."""
    return pd.Series(np.log1p(v.to_numpy()))


# --- grouped-agg pandas_udf -------------------------------------------------


@F.pandas_udf(DoubleType())
def exact_mean(v: pd.Series) -> float:
    """Group mean via exact-cents accumulation (twin: the engine's
    cents-sum/count — queries/_util.py::cents). Cents use the shared
    half-away-from-zero kernel, NOT np.rint (half-to-even would break
    parity for values landing exactly on .5 cents)."""
    from frauddetection_spark.operators.vectors import round_half_away_np

    cents = round_half_away_np(v.to_numpy(), 100)
    return float(cents.sum()) / len(cents) / 100.0


# --- grouped-map applyInPandas ----------------------------------------------

ZSCORE_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("zscore", DoubleType()),
    ]
)


def zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group population z-score with exact-int moments:
    μ and σ are derived from Σc and Σc² (int64 cents), so the result
    is bit-identical to the SQL formula in q_pandas_udf_zscore's
    oracle twin — the determinism policy survives the Python hop."""
    from frauddetection_spark.operators.vectors import round_half_away_np

    c = round_half_away_np(pdf["value"].to_numpy(), 100)
    n = len(c)
    s1, s2 = int(c.sum()), int((c * c).sum())
    mu = s1 / n
    var = s2 / n - mu * mu
    sd = np.sqrt(var)
    z = (c - mu) / sd if sd > 0 else np.zeros(n)
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z}
    )


def zscore_per_user(events: DataFrame) -> DataFrame:
    """applyInPandas grouped-map: one Arrow batch per user group.
    Scale: the groupBy shuffles on user_id; each Python worker sees
    whole groups — fine while per-group data fits a worker (true for
    per-user CDR slices; for giant groups use the window-function
    form, q_zscore)."""
    return events.select("event_id", "user_id", "value").groupBy("user_id").applyInPandas(
        zscore_group, schema=ZSCORE_SCHEMA
    )


# --- mapInPandas ------------------------------------------------------------

TOKEN_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("n_types", LongType()),
        StructField("top_token", StringType()),
    ]
)


def doc_token_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: batch-streaming partition transform (no grouping,
    no shuffle — each Arrow batch in, one batch out). Deterministic
    top_token tie-break: (count desc, token asc)."""
    for pdf in batches:
        toks = pdf["text"].str.split()
        top = [
            min(((-v, k) for k, v in pd.Series(t).value_counts().items()))[1]
            if len(t)
            else None
            for t in toks
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_tokens": toks.str.len().astype("int64"),
                "n_types": toks.apply(lambda t: len(set(t))).astype("int64"),
                "top_token": top,
            }
        )


def document_stats(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "text").mapInPandas(
        doc_token_stats, schema=TOKEN_STATS_SCHEMA
    )


@F.pandas_udf(LongType())
def zlib_size(text: pd.Series) -> pd.Series:
    """DEFLATE-compressed byte length at fixed level 6 — Arrow-batched,
    stdlib zlib, deterministic for a fixed zlib build. The raw
    material of the compressibility quality signal (see
    q_compress_ratio)."""
    import zlib

    return text.map(lambda s: len(zlib.compress((s or "").encode("utf-8"), 6)))
