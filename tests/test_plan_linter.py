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


def test_unpartitioned_windows_detector(spark):
    """r10: the exact logical-plan detector behind the registry-wide
    no-single-partition-window invariant — must flag ORDER-BY-only
    windows, pass PARTITION-BY windows (with or without ORDER BY), and
    not be fooled by WindowGroupLimit (whose first bracket group is the
    partition spec) or by scalar aggregates elsewhere in the plan."""
    from pyspark.sql import Window

    from iatlas_cbioportal_export_spark.plans.linter import (
        unpartitioned_windows,
    )

    df = spark.range(100).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )

    # ORDER BY only -> flagged
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("v")))
    assert unpartitioned_windows(bad), "global window not detected"

    # PARTITION BY + ORDER BY -> clean
    ok = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("v"))
    )
    assert unpartitioned_windows(ok) == []

    # PARTITION BY without ORDER BY (count over partition) -> clean;
    # this shape also prints only TWO bracket groups, the case that
    # false-positived the first r10 sweep
    ok2 = df.withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    assert unpartitioned_windows(ok2) == []

    # rank()<=k filter optimizes to WindowGroupLimit above the Window —
    # still a partitioned plan, must stay clean
    ok3 = (
        df.withColumn(
            "rk",
            F.rank().over(Window.partitionBy("g").orderBy(F.desc("v"))),
        )
        .filter(F.col("rk") <= 2)
    )
    assert unpartitioned_windows(ok3) == []

    # a scalar aggregate (SinglePartition exchange) NEXT TO a partitioned
    # window — the physical-plan heuristic's false-positive shape
    agg = df.groupBy().agg(F.sum("v").alias("t"))
    mixed = ok.crossJoin(F.broadcast(agg))
    assert unpartitioned_windows(mixed) == []
