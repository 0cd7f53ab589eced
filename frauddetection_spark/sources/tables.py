"""Explicit schemas + loaders for the engine's tables.

The reference infers every schema at read time (pandas ``read_csv``,
``Code for Sichuan/Data_processing/data_process.py:53-55``). At 100 TB
schema inference is a full scan, so this engine pins an explicit
StructType per source and *asserts* it against what arrives — a
mismatch should fail loudly at plan time, not silently coerce.

Tables mirror /root/testdata/sf*/: a TPC-H-ish star schema plus
``events`` (the CDR-shaped stream table, standing in for voc.csv),
``documents`` and ``embeddings`` (LLM-pipeline extensions).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, StructType] = {
    "region": _s(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _s(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _s(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    # CDR-shaped event stream: maps to the reference's voc.csv
    # (phone_no_m→user_id, start_datetime→ts, calltype_id→event_type,
    # call_dur→value; data_process.py:55-58).
    "events": _s(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _s(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _s(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(SCHEMAS)

# Runtime-settable confs the engine's read path depends on. The driver
# harness (and any downstream user) may hand us a PLAIN SparkSession
# without the repo's session factory, so every read entry point applies
# these defensively — both are runtime-settable on a live session:
#  - nanosAsLong: events.parquet carries INT64 TIMESTAMP(NANOS); without
#    this flag a vanilla session dies with PARQUET_TYPE_ILLEGAL before
#    any query runs (round-1 driver failure mode).
#  - UTC session timezone: keeps timestamp rendering/extraction identical
#    across Spark and the DuckDB oracle regardless of host timezone.
_REQUIRED_CONFS: tuple[tuple[str, str], ...] = (
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ("spark.sql.session.timeZone", "UTC"),
)


def ensure_read_confs(spark: SparkSession) -> None:
    """Apply the runtime confs any session needs to read our tables."""
    for key, value in _REQUIRED_CONFS:
        try:
            spark.conf.set(key, value)
        except Exception:
            # Best effort: if a conf became static in some future Spark,
            # the subsequent read will raise a clear error anyway.
            pass


# footer-schema memo: path → raw Spark schema. Testdata is immutable;
# re-reading footers on every plan construction costs a Spark job each
# time (ParquetFileFormat.inferSchema), which this eliminates entirely.
_RAW_SCHEMA_CACHE: dict[str, StructType] = {}


def _arrow_to_spark(arrow_type) -> object:
    """Map the physical arrow types our tables use to Spark types.
    timestamp[ns] maps to LongType — the nanosAsLong representation the
    rest of the loader converts with `div 1000`."""
    import pyarrow as pa

    if pa.types.is_int32(arrow_type):
        return IntegerType()
    if pa.types.is_int64(arrow_type):
        return LongType()
    if pa.types.is_float64(arrow_type):
        return DoubleType()
    if pa.types.is_float32(arrow_type):
        return FloatType()
    if pa.types.is_string(arrow_type) or pa.types.is_large_string(arrow_type):
        return StringType()
    if pa.types.is_timestamp(arrow_type):
        if arrow_type.unit == "ns":
            return LongType()
        return TimestampType()
    if pa.types.is_list(arrow_type) or pa.types.is_large_list(arrow_type):
        return ArrayType(_arrow_to_spark(arrow_type.value_type))
    raise TypeError(f"unmapped arrow type {arrow_type}")


def _raw_schema(path: str) -> StructType:
    """Physical schema from the parquet footer — a driver-side pyarrow
    metadata read (NO Spark job), memoized per path. Handing Spark an
    explicit schema skips its schema-inference job at plan time; at
    100 TB that job is a full footer sweep across every file."""
    cached = _RAW_SCHEMA_CACHE.get(path)
    if cached is not None:
        return cached
    import pyarrow.parquet as pq

    arrow = pq.read_schema(path)
    raw = StructType(
        [StructField(f.name, _arrow_to_spark(f.type), True) for f in arrow]
    )
    _RAW_SCHEMA_CACHE[path] = raw
    return raw


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table with its pinned schema.

    The physical schema comes from a driver-side footer read (memoized;
    no Spark job) and is verified against the pinned one — a mismatch
    fails loudly at plan time rather than silently coercing.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    ensure_read_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    raw = _raw_schema(path)
    df = spark.read.schema(raw).parquet(path)
    expected = {f.name: f.dataType for f in SCHEMAS[name].fields}
    got = {f.name: f.dataType for f in df.schema.fields}
    if set(expected) - set(got):
        raise ValueError(
            f"table {name}: missing columns {sorted(set(expected) - set(got))}"
        )
    return pinned_projection(df, name)


def pinned_projection(df: DataFrame, name: str) -> DataFrame:
    """Project a raw-schema frame onto the pinned schema for ``name``.

    Casts only where the physical type drifted (e.g. int32 where int64
    is pinned). Timestamps written as INT64 TIMESTAMP(NANOS) arrive as
    long nanos (nanosAsLong) and are truncated to micros with integer
    division — the same truncation DuckDB applies; timestamps already
    in micros pass through untouched. Shared by the batch loader and
    the streaming source so both adapt to whichever physical encoding
    the files carry.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType as _Long

    expected = {f.name: f.dataType for f in SCHEMAS[name].fields}
    got = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for c in expected:
        if isinstance(expected[c], TimestampType) and got[c] == _Long():
            cols.append(F.timestamp_micros(F.expr(f"`{c}` div 1000")).alias(c))
        elif got[c] != expected[c]:
            cols.append(df[c].cast(expected[c]).alias(c))
        else:
            cols.append(df[c])
    return df.select(*cols)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
