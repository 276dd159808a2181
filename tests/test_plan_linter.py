"""Plan linter: anti-pattern detection on real plans."""

import pytest
import pyspark.sql.functions as F

from iatlas_cbioportal_export_spark.plans.linter import assert_scale_safe, lint_plan


def test_clean_aggregation_plan_passes(spark):
    df = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    assert lint_plan(df) == []
    assert_scale_safe(df)


def test_cross_join_flagged(spark):
    a, b = spark.range(10), spark.range(10)
    crossed = a.crossJoin(b)
    codes = {c for _s, c, _m in lint_plan(crossed)}
    assert codes & {"cartesian", "nested-loop"}
    with pytest.raises(AssertionError, match="not scale-safe"):
        assert_scale_safe(crossed)


def test_nested_loop_allowed_when_deliberate(spark):
    a = spark.range(1000).select(F.col("id").alias("x"))
    b = spark.range(3).select(F.col("id").alias("q"))
    scored = a.crossJoin(F.broadcast(b))
    assert_scale_safe(scored, allow_nested_loop=True)


def test_python_udf_flagged_but_pandas_udf_clean(spark):
    import pandas as pd
    from pyspark.sql.types import LongType

    py = F.udf(lambda x: x + 1, LongType())
    df_py = spark.range(100).select(py("id").alias("y"))
    assert any(c == "python-udf" for _s, c, _m in lint_plan(df_py))

    @F.pandas_udf(LongType())
    def plus1(s: pd.Series) -> pd.Series:
        return s + 1

    df_pd = spark.range(100).select(plus1("id").alias("y"))
    assert not any(c == "python-udf" for _s, c, _m in lint_plan(df_pd))


def test_global_window_warned(spark):
    from pyspark.sql import Window

    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert any(c == "global-window" or c == "global-sort"
               for _s, c, _m in lint_plan(df))
    # warns only — assert_scale_safe still passes
    assert_scale_safe(df)
