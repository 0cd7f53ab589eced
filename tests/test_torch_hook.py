"""M1 scoring-hook tests: the broadcast-weights mapInPandas plumbing
is real and deterministic; the torch kernel is honestly gated (no
torch in this container)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from frauddetection_spark.functions.torch_hook import (
    numpy_linear_tanh,
    score_batches,
    torch_forward,
    try_import_torch,
)


def test_score_matches_local_forward(spark):
    pdf_w = {"w": np.array([0.5, -1.0]), "b": 0.25}
    df = spark.createDataFrame(
        [(1, 0.2, 0.3), (2, -0.4, 1.5), (3, 0.0, 0.0)], "id long, a double, b double"
    )
    out = score_batches(df, ["a", "b"], pdf_w).orderBy("id").collect()
    X = np.array([[0.2, 0.3], [-0.4, 1.5], [0.0, 0.0]])
    expected = numpy_linear_tanh(X, pdf_w)
    got = np.array([r.score for r in out])
    assert np.array_equal(got, expected)  # bit-identical, not approx
    # schema: input columns preserved + appended score
    assert [f.name for f in score_batches(df, ["a", "b"], pdf_w).schema] == [
        "id", "a", "b", "score",
    ]


def test_scoring_is_map_only(spark):
    """The scoring pass must add no shuffle: a pure scan+append plan."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 0.01).alias("a"), F.lit(1.0).alias("b")
    )
    out = score_batches(df, ["a", "b"], {"w": np.array([1.0, 1.0]), "b": 0.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_torch_kernel_honestly_gated(spark):
    if try_import_torch() is not None:
        pytest.skip("torch installed; gating path not applicable")
    with pytest.raises(NotImplementedError, match="torch is not installed"):
        torch_forward(np.zeros((1, 2)), {})
