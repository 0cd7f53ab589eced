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
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


# ---------------------------------------------------------------------------
# custom Python SINK (DataSourceWriter with a two-phase commit)
# ---------------------------------------------------------------------------


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    n_rows: int


class _JsonlDirWriter(DataSourceWriter):
    """Task-temp-file + driver-manifest two-phase commit.

    Each task writes its rows to a uniquely-named ``part-*.jsonl``
    (task side effects are invisible until commit); the driver's
    ``commit`` writes ``_SUCCESS.json`` listing exactly the committed
    files with row counts. Readers trust ONLY manifest-listed files,
    so a failed/speculative task's orphan file can never leak into a
    read — the same visibility protocol every table format's sink
    uses. ``abort`` removes temp files best-effort."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonldir sink requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, fname)
        n = 0
        with open(full, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFile(path=fname, n_rows=n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(
                [m.path, m.n_rows] for m in messages if m is not None
            ),
        }
        with open(os.path.join(self.path, "_SUCCESS.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages or []:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.path))
                except OSError:
                    pass


class JsonlDirDataSource(DataSource):
    """``df.write.format("jsonldir").option("path", ...).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonldir"

    def writer(self, schema, overwrite: bool):
        return _JsonlDirWriter(self.options, overwrite)


def read_jsonldir(path: str) -> list[dict]:
    """Manifest-respecting reader: ONLY files listed in _SUCCESS.json
    are visible (orphans from failed tasks are ignored)."""
    import json
    import os

    with open(os.path.join(path, "_SUCCESS.json")) as f:
        manifest = json.load(f)
    rows: list[dict] = []
    for fname, _n in manifest["files"]:
        with open(os.path.join(path, fname)) as f:
            rows.extend(json.loads(line) for line in f)
    return rows


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)
