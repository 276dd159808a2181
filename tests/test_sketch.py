"""Count-min sketch: one-sided error, exactness without collisions, and
shard mergeability (the property that makes it a 100 TB profiling tool)."""

from iatlas_cbioportal_export_spark.operators.sketch import (
    count_min_build,
    count_min_estimate,
)


def test_cms_estimates_never_undercount(spark):
    rows = [(i, f"tok{i % 13} filler common the the words") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counters = count_min_build(df, depth=4, width=64)
    out = count_min_estimate(df, ["the", "filler", "tok0", "absent"], counters)
    for r in out.collect():
        assert r["overcount"] >= 0, r
        assert r["est_count"] >= r["true_count"]


def test_cms_exact_when_width_dominates_vocab(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], "doc_id long, text string"
    )
    counters = count_min_build(df, depth=4, width=4096)
    out = {
        r["token"]: r
        for r in count_min_estimate(
            df, ["alpha", "beta", "gamma", "delta"], counters
        ).collect()
    }
    assert out["alpha"]["est_count"] == 2 and out["alpha"]["overcount"] == 0
    assert out["beta"]["est_count"] == 2
    assert out["gamma"]["est_count"] == 1
    assert out["delta"]["est_count"] == 0 and out["delta"]["true_count"] == 0


def test_cms_shard_sketches_merge_by_addition(spark):
    rows = [(i, f"w{i % 5} w{i % 3} common") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    whole = count_min_build(df, depth=2, width=32)
    a = count_min_build(df.filter("doc_id % 2 = 0"), depth=2, width=32)
    b = count_min_build(df.filter("doc_id % 2 = 1"), depth=2, width=32)
    merged = [
        [x + y for x, y in zip(ra, rb)] for ra, rb in zip(a, b)
    ]
    assert merged == whole
