"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the extension point for reading in-house formats / services that have
no JVM connector.

The registered source ("lehmer") is a deterministic partitioned
generator: row i carries the repo's standard Lehmer hash
(i % P)·A mod P and a 16-way bucket — so its content is reproducible
in any engine (the DuckDB oracle regenerates it with generate_series
and the same integer arithmetic), making the *source machinery* fully
hash-checkable, not just smoke-tested.

Scale notes:
- ``partitions()`` returns explicit :class:`InputPartition` splits, so
  parallelism is source-driven (each executor task reads one range) —
  the same contract a JDBC/REST/blob-store source would use for
  predicate-free splits.
- ``read()`` yields **pyarrow RecordBatches built from numpy arrays**,
  the vectorized path across the Python↔JVM boundary — never
  row-at-a-time tuple yields (10-100× slower, the same rule as
  pandas_udf vs plain Python UDFs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import LongType, StructField, StructType

LEHMER_P = 2_147_483_647  # 2^31 - 1
LEHMER_A = 48_271
N_BUCKETS = 16
_BATCH = 65_536


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class _LehmerReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100_000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [
            _RangePartition(i * step, min((i + 1) * step, self.n))
            for i in range(self.parts)
            if i * step < self.n
        ]

    def read(self, partition: _RangePartition):
        for lo in range(partition.lo, partition.hi, _BATCH):
            hi = min(lo + _BATCH, partition.hi)
            ids = np.arange(lo, hi, dtype=np.int64)
            hv = (ids % LEHMER_P) * LEHMER_A % LEHMER_P
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(hv, type=pa.int64()),
                    pa.array(hv % N_BUCKETS, type=pa.int64()),
                ],
                names=["id", "hv", "bucket"],
            )


class LehmerDataSource(DataSource):
    """``spark.read.format("lehmer").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "lehmer"

    def schema(self):
        return StructType(
            [
                StructField("id", LongType()),
                StructField("hv", LongType()),
                StructField("bucket", LongType()),
            ]
        )

    def reader(self, schema):
        return _LehmerReader(self.options)

    def simpleStreamReader(self, schema):
        return _LehmerSimpleStreamReader(self.options)


def register(spark) -> None:
    """Idempotent session-level registration."""
    spark.dataSource.register(LehmerDataSource)


class _LehmerSimpleStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked stream over the same deterministic rows.

    Offsets are plain row positions ({"pos": k}); ``read`` advances at
    most ``step`` rows per microbatch and ``readBetweenOffsets``
    regenerates any committed range EXACTLY (pure arithmetic — replay
    after failure yields identical rows, which is what makes the
    source exactly-once-capable under checkpointing)."""

    def __init__(self, options):
        self.n = int(options.get("n", 100_000))
        self.step = int(options.get("step", 25_000))

    def initialOffset(self):
        return {"pos": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST, not a generator: the engine's prefetch cache
        # copy.copy()s the returned iterator between planPartitions
        # calls, which generators don't support; bounded by ``step``
        return [
            (i, (i % LEHMER_P) * LEHMER_A % LEHMER_P,
             (i % LEHMER_P) * LEHMER_A % LEHMER_P % N_BUCKETS)
            for i in range(lo, hi)
        ]

    def read(self, start):
        lo = int(start["pos"])
        hi = min(lo + self.step, self.n)
        # iter() over the list: the engine requires a true iterator
        # (it calls next()), and list_iterators are copyable/picklable
        # where generators are not
        return iter(self._rows(lo, hi)), {"pos": hi}

    def readBetweenOffsets(self, start, end):
        return iter(self._rows(int(start["pos"]), int(end["pos"])))
