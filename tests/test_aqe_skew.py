"""AQE skew-join engagement evidence (VERDICT r5 #7): prove that Spark's
OptimizeSkewedJoin actually splits a planted power-law key under this
repo's session settings — the runtime complement to the manual
``salted_join``. The thresholds are lowered to local-test scale (the
defaults are 256 MB partitions, cluster-sized); the FACTOR stays >1 so
only a genuinely skewed partition triggers. Evidence = the final adaptive
plan's join node carrying ``skew=true`` (+ an ``AQEShuffleRead skewed``
child) plus result equality against the skew-handling-off run.

Gotcha pinned here: the plan must be read from the SAME DataFrame that was
executed — ``df.count()`` plans its own job, so inspect after
``df.collect()``.
"""

import pytest
from pyspark.sql import functions as F

#: Every knob here is a runtime SQL conf, so the test runs in a
#: ``newSession()`` — an isolated SQL-conf view over the suite's shared
#: SparkContext. A ``builder.getOrCreate()`` here would RETURN the shared
#: session (mutating its confs), and ``stop()`` would kill the context for
#: every module after this one — exactly the FFF-cascade the suite saw
#: when this fixture briefly did that.
_SKEW_CONFS = {
    "spark.sql.shuffle.partitions": "8",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50k",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture(scope="module")
def skew_spark(spark):
    isolated = spark.newSession()
    for key, value in _SKEW_CONFS.items():
        isolated.conf.set(key, value)
    yield isolated


def _skewed_join(spark):
    # power-law key: ~50% of 200k fact rows land on key 0
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % 97)
        .alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(97).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("d_rows")
    )
    return fact.join(dim, "k")


def _run(spark):
    j = _skewed_join(spark)
    rows = j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    checksum = sum(r["v"] * r["d_rows"] for r in rows)
    return len(rows), checksum, plan


def test_aqe_skew_split_engages_and_preserves_results(skew_spark):
    n_on, sum_on, plan_on = _run(skew_spark)
    assert "skew=true" in plan_on, plan_on[:2000]
    assert "AQEShuffleRead skewed" in plan_on

    skew_spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        n_off, sum_off, plan_off = _run(skew_spark)
    finally:
        skew_spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert "skew=true" not in plan_off
    assert (n_on, sum_on) == (n_off, sum_off)
