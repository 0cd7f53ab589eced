"""The Python surface must agree with its built-in twins — the
'UDFs are the slow path' rule is enforceable only if both paths give
identical answers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frauddetection_spark.functions.pandas_udfs import (
    exact_mean,
    log1p_value,
    token_count,
)
from frauddetection_spark.sources.tables import load_table


def test_scalar_token_count_matches_builtin(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    both = docs.select(
        token_count("text").alias("udf"),
        F.size(F.split("text", r"\s+")).alias("builtin"),
    )
    assert both.filter(F.col("udf") != F.col("builtin")).count() == 0


def test_scalar_log1p_matches_builtin(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    both = e.select(
        F.round(log1p_value("value"), 9).alias("udf"),
        F.round(F.log1p("value"), 9).alias("builtin"),
    )
    assert both.filter(F.col("udf") != F.col("builtin")).count() == 0


def test_grouped_agg_exact_mean_matches_cents_sum(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    udf_side = e.groupBy("user_id").agg(exact_mean("value").alias("m"))
    builtin = e.groupBy("user_id").agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("double")
            / F.count("*")
            / 100
        ).alias("m")
    )
    joined = udf_side.alias("a").join(builtin.alias("b"), "user_id")
    assert joined.filter(F.col("a.m") != F.col("b.m")).count() == 0
