"""Bucketed tables: exchange-free co-located joins and aggregations."""

import pytest
from pyspark.sql import functions as F

from iatlas_cbioportal_export_spark.sources.bucketing import (
    bucketed_join,
    plan_has_no_exchange,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    # simulate the fact-fact case bucketing exists for: with both sides
    # small enough to broadcast, the planner (correctly) prefers broadcast
    # and ignores bucketing, so pin it off for the plan assertions
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_custkey"),
        (F.col("id") * 7 % 100).alias("o_total"),
    )
    customer = spark.range(0, 500).select(
        F.col("id").alias("o_custkey"),
        F.concat(F.lit("c"), F.col("id")).alias("c_name"),
    )
    write_bucketed(orders, "t_bucketed_orders", ["o_custkey"], 4, ["o_custkey"])
    write_bucketed(customer, "t_bucketed_customer", ["o_custkey"], 4, ["o_custkey"])
    yield "t_bucketed_orders", "t_bucketed_customer"
    spark.sql("DROP TABLE IF EXISTS t_bucketed_orders")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, on=["o_custkey"])
    assert plan_has_no_exchange(joined), joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == 500


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, on=["o_custkey"])
    plain = (
        spark.table(left)
        .repartition(8)  # break bucketing on purpose
        .join(spark.table(right), on="o_custkey")
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables, no_broadcast):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_custkey").agg(F.sum("o_total").alias("s"))
    assert plan_has_no_exchange(agg)


def test_unbucketed_join_does_exchange(spark, bucketed_tables, no_broadcast):
    # control: the same join with bucketing broken on purpose must shuffle —
    # proves the assertion actually measures bucketing
    left, right = bucketed_tables
    plain = (
        spark.table(left)
        .repartition(8)
        .join(spark.table(right).repartition(8), on="o_custkey")
    )
    assert not plan_has_no_exchange(plain)
