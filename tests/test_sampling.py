"""Deterministic hash-based sampling / splitting (reproducibility is the
contract: same rows selected under any partitioning)."""

import pytest

from iatlas_cbioportal_export_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)


def test_sample_invariant_to_partitioning(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in deterministic_sample(df.coalesce(1), "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in deterministic_sample(df.repartition(16), "doc_id", 0.3).collect()}
    assert a == b
    # fraction approximately honored (hash buckets are near-uniform)
    assert 0.2 < len(a) / 1000 < 0.4


def test_sample_salt_changes_selection(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3, salt=0).collect()}
    b = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.3, salt=7).collect()}
    assert a != b


def test_split_partitions_everything_once(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id").groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_split_and_sample_validate_inputs(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(df, "doc_id", 1.5)
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "doc_id", weights={"a": 0.5, "b": 0.2})


def test_stratified_sample_honors_per_stratum_fractions(spark):
    from iatlas_cbioportal_export_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(
        df, "doc_id", "source", fractions={"a": 0.8}, default_fraction=0.1
    )
    counts = {r["source"]: r["count"]
              for r in out.groupBy("source").count().collect()}
    assert 0.7 < counts["a"] / 1000 < 0.9
    assert 0.03 < counts.get("b", 0) / 1000 < 0.2
    # determinism under repartition
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in stratified_sample(
        df.repartition(16), "doc_id", "source",
        fractions={"a": 0.8}, default_fraction=0.1).collect()}
    assert a == b
    import pytest
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, "doc_id", "source", fractions={"a": 2.0})
