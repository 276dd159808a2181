"""Dynamic partition pruning: a filter on the dim side of a join must prune
fact PARTITIONS at runtime (the 100 TB equivalent: scanning 1 day instead of
7 years when the dim filter selects one day)."""

import pyspark.sql.functions as F


def _plan(df) -> str:
    qe = df._jdf.queryExecution()
    jmode = (
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    return qe.explainString(jmode)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    fact_path = str(tmp_path / "fact_by_priority")
    fact = spark.createDataFrame(
        [(i, f"P{i % 5}", float(i)) for i in range(1000)],
        "id long, prio string, amount double",
    )
    fact.write.partitionBy("prio").parquet(fact_path)

    dim = spark.createDataFrame(
        [("P0", "keep"), ("P1", "drop"), ("P2", "drop"),
         ("P3", "drop"), ("P4", "drop")],
        "prio string, tag string",
    )
    part_fact = spark.read.parquet(fact_path)
    joined = part_fact.join(
        F.broadcast(dim.filter(F.col("tag") == "keep")), on="prio"
    )

    plan = _plan(joined)
    assert "dynamicpruningexpression" in plan, plan[:2000]
    # semantics: only P0 rows survive
    assert joined.count() == 200
    assert joined.select("prio").distinct().collect()[0]["prio"] == "P0"


def test_partition_pruning_static_filter(spark, tmp_path):
    # control: a literal partition filter prunes statically (PartitionFilters
    # in the scan, no DPP machinery needed)
    fact_path = str(tmp_path / "fact_static")
    spark.createDataFrame(
        [(i, f"P{i % 3}") for i in range(300)], "id long, prio string"
    ).write.partitionBy("prio").parquet(fact_path)
    df = spark.read.parquet(fact_path).filter(F.col("prio") == "P1")
    plan = _plan(df)
    assert "PartitionFilters" in plan and "P1" in plan
    assert df.count() == 100
